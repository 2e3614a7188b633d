"""Span-amortized Beluga forward: share convolution work across overlapping
shift windows.

Both hot paths evaluate Beluga on windows taken at 200-bp strides from one
contiguous region (variant path: 9 shifts spanning 3.6 kb,
chromatin.py:243; gene path: 200 shifts spanning 41.8 kb,
compute_expecto_features.py:88). The reference runs the full CNN per window
— re-convolving bases that up to 10 (variant) / 200 (gene) windows share.

Valid convolutions are shift-covariant, so conv1..conv4 can run **once over
the whole span**; each window's activation is a slice. The two 4-wide
max-pools constrain alignment:

- pool1 (stride 4): window offsets are multiples of 200 ≡ 0 (mod 4) — one
  shared pooled span.
- pool2 (stride 16 in base coords): offsets/4 are multiples of 50 ≡ {0, 2}
  (mod 4) — two pooling phases; conv5/conv6 run once per phase.

After conv6 each window is a static 106-frame slice of its phase; the dense
layers run per window as before. Per-window conv FLOPs drop ~5x (variant
path) / ~20x (gene path); results are identical to the per-window forward
up to floating-point reduction order (tested at 1e-5).

Incremental alt scoring: conv6 frame ``f`` of phase ``ph`` depends only on
span inputs ``[16f + 4ph, 16f + 4ph + 310)``, so a single-base substitution
perturbs ~20 conv6 frames. :func:`conv6_phases_patch` recomputes just those
frames from a short 16-aligned sub-span and splices them into the reference
allele's phase buffers — the alt allele's conv cost drops ~80%
(runner._score_spans_packed uses this; equality tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..models.beluga import BelugaParams, _conv_relu

#: conv6 frame f (phase ph) reads span inputs [16f + 4ph, 16f + 4ph + RF)
CONV6_RF = 310
CONV6_STRIDE = 16




def _pool4_from(x, phase: int):
    """Max-pool width/stride 4 starting at ``phase`` (floor remainder drop)."""
    n, l, c = x.shape
    usable = ((l - phase) // 4) * 4
    return jnp.max(x[:, phase : phase + usable, :].reshape(n, usable // 4, 4, c), axis=2)


def conv1_acts(params: BelugaParams, spans: jax.Array, *, precision=lax.Precision.HIGHEST) -> jax.Array:
    """conv0+conv1 activations of (N, L, 4) spans -> (N, L-14, 320); element
    ``j`` depends only on span positions [j, j+14]. Exposed separately so
    kernels that can SHARE these two layers (the FLOP bulk) between related
    spans — e.g. the indel ext kernel, where ref and alt conv1 are both
    gathers of one extended span's activations — reuse the exact stack."""
    h = _conv_relu(spans, params["conv0"], precision)
    return _conv_relu(h, params["conv1"], precision)


def conv6_from_conv1(
    params: BelugaParams,
    h: jax.Array,
    phases,
    *,
    precision=lax.Precision.HIGHEST,
) -> dict[int, jax.Array]:
    """conv2..conv6 from conv1 activations aligned at span position 0 (the
    pooling lattice is anchored there) -> {phase: (N, n_frames, 640)}."""
    p1 = _pool4_from(h, 0)
    h = _conv_relu(p1, params["conv2"], precision)
    h = _conv_relu(h, params["conv3"], precision)
    out = {}
    for ph in sorted(set(int(p) for p in phases)):
        p2 = _pool4_from(h, ph)
        g = _conv_relu(p2, params["conv4"], precision)
        out[ph] = _conv_relu(g, params["conv5"], precision)
    return out


def conv6_phases(
    params: BelugaParams,
    spans: jax.Array,
    phases,
    *,
    precision=lax.Precision.HIGHEST,
) -> dict[int, jax.Array]:
    """conv1..conv6 over full spans, once per pool2 phase.

    Returns {phase: (N, n_frames, 640)}; window at span offset ``o`` occupies
    frames [ (o//4 - ph)//4 : +106 ] of phase ``ph = (o//4) % 4``.
    """
    return conv6_from_conv1(
        params, conv1_acts(params, spans, precision=precision), phases, precision=precision
    )


def conv6_frame_range(mutpos: int, ph: int) -> tuple[int, int]:
    """[f_lo, f_hi) conv6 frames of phase ``ph`` whose receptive field
    contains span position ``mutpos``."""
    f_lo = max(0, -(-(mutpos - CONV6_RF + 1 - 4 * ph) // CONV6_STRIDE))
    f_hi = (mutpos - 4 * ph) // CONV6_STRIDE + 1
    return f_lo, max(f_hi, f_lo)


def conv6_patch_ranges(mutpos: int, mut_len: int, phases, frame_counts: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{phase: [f_lo, f_hi)} conv6 frames affected by a mutation at
    ``[mutpos, mutpos + mut_len)`` — the first base gives the lowest frame,
    the last base the highest."""
    ranges = {}
    for ph in sorted(set(int(p) for p in phases)):
        f_lo, _ = conv6_frame_range(mutpos, ph)
        _, f_hi = conv6_frame_range(mutpos + mut_len - 1, ph)
        ranges[ph] = (f_lo, min(f_hi, frame_counts[ph]))
    return ranges


def conv6_phases_patch(
    params: BelugaParams,
    ref_phases: dict[int, jax.Array],
    alt_spans: jax.Array,
    mutpos: int,
    mut_len: int,
    phases,
    *,
    precision=lax.Precision.HIGHEST,
) -> dict[int, jax.Array]:
    """Phase buffers for the alt allele by recomputing only the conv6 frames
    whose receptive field overlaps ``[mutpos, mutpos + mut_len)``.

    A 16-aligned sub-span covering those frames' receptive fields is run
    through the conv stack; because the sub-span start is ≡ 0 (mod 16), its
    pool phases align with the full span's and sub-frame ``f'`` equals span
    frame ``f' + s0/16``. All indices are static (the serving path centers
    every variant at the same ``mutpos``).
    """
    span_len = alt_spans.shape[1]
    phases = sorted(set(int(p) for p in phases))
    ranges = conv6_patch_ranges(
        mutpos, mut_len, phases, {ph: ref_phases[ph].shape[1] for ph in phases}
    )

    # sub-span covering every phase's frames, 16-aligned
    in_lo = min(CONV6_STRIDE * ranges[ph][0] + 4 * ph for ph in phases)
    in_hi = max(CONV6_STRIDE * (ranges[ph][1] - 1) + 4 * ph + CONV6_RF for ph in phases)
    s0 = max(0, (in_lo // CONV6_STRIDE) * CONV6_STRIDE)
    s1 = min(span_len, in_hi)
    sub = lax.slice_in_dim(alt_spans, s0, s1, axis=1)
    sub_phases = conv6_phases(params, sub, phases, precision=precision)

    out = {}
    for ph in phases:
        f_lo, f_hi = ranges[ph]
        n_frames = f_hi - f_lo
        buf = ref_phases[ph]
        if n_frames <= 0:
            out[ph] = buf
            continue
        sub_lo = f_lo - s0 // CONV6_STRIDE
        patch = lax.slice_in_dim(sub_phases[ph], sub_lo, sub_lo + n_frames, axis=1)
        out[ph] = lax.dynamic_update_slice_in_dim(buf, patch.astype(buf.dtype), f_lo, axis=1)
    return out


#: default sub-span length for multi-site patching: covers all conv6 frames
#: whose receptive field (310 bp) touches a diff range of width <=
#: PATCH_SUB_LEN - 672 after 16-alignment slack on both ends
PATCH_SUB_LEN = 704


def conv6_covering_start(a: int, b: int, span_len: int, sub_len: int, phases, frame_counts) -> int | None:
    """16-aligned sub-span start ``s0`` such that the ``sub_len``-long
    sub-span's conv6 frames cover EVERY frame (of every phase in ``phases``)
    whose receptive field touches span positions ``[a, b]`` — or None when no
    aligned start covers them (range too wide for ``sub_len``, or the span's
    unaligned tail). Host-side planning helper for
    :func:`conv6_phases_patch_sites`."""
    s0 = 16 * ((a - CONV6_RF) // CONV6_STRIDE)
    s0 = max(0, min(s0, 16 * ((span_len - sub_len) // CONV6_STRIDE)))
    if s0 + sub_len > span_len:
        return None
    f0 = s0 // CONV6_STRIDE
    for ph in sorted(set(int(p) for p in phases)):
        f_lo, _ = conv6_frame_range(a, ph)
        _, f_hi = conv6_frame_range(b, ph)
        f_hi = min(f_hi, frame_counts[ph])  # exclusive
        cnt = (sub_len - 4 * ph - CONV6_RF) // CONV6_STRIDE + 1
        if f0 > max(f_lo, 0) or f0 + cnt < f_hi:
            return None
    return s0


#: conv1-recompute geometry for the layered patch kernel: a diff range
#: [a, b] (width <= sub_len-672) perturbs conv1 activations [a-14, b]; a
#: C1_PATCH_BASES-wide base slice at d0 = clip(a-14, 0, L-C1_PATCH_BASES)
#: yields C1_PATCH_BASES-14 conv1 outputs covering them in every clip case
C1_PATCH_BASES = 80


def conv6_patch_sites_plan(
    diff_positions, span_len: int, phases, *, sub_len: int = PATCH_SUB_LEN, max_ranges: int = 32
) -> list[tuple[int, int]] | None:
    """Greedy plan: merge sorted ``diff_positions`` (span coords where a
    sample differs from its backbone) into <= ``max_ranges`` covering
    ranges for the patch kernels. Each entry is ``(w0, d0)``: the
    16-aligned sub-span start whose conv6 frames cover the range
    (:func:`conv6_phases_patch_sites` uses w0 alone) and the base start of
    the :data:`C1_PATCH_BASES`-wide conv1-recompute slice
    (:func:`conv6_phases_patch_sites_c1`). Returns None when the record is
    not patchable (too many scattered sites — the full span forward is
    then cheaper anyway — or an uncoverable alignment corner)."""
    pos = sorted(int(p) for p in diff_positions)
    if not pos:
        return []
    frame_counts = {
        ph: (span_len - 4 * ph - CONV6_RF) // CONV6_STRIDE + 1
        for ph in sorted(set(int(p) for p in phases))
    }
    width_max = sub_len - 672
    starts: list[tuple[int, int]] = []
    a = b = pos[0]
    for p in pos[1:] + [None]:
        if p is not None and p - a <= width_max:
            b = p
            continue
        s0 = conv6_covering_start(a, b, span_len, sub_len, phases, frame_counts)
        if s0 is None or len(starts) >= max_ranges:
            return None
        d0 = max(0, min(a - 14, span_len - C1_PATCH_BASES))
        starts.append((s0, d0))
        if p is not None:
            a = b = p
    return starts


def conv6_phases_patch_sites(
    params: BelugaParams,
    base_phases: dict[int, jax.Array],
    alt_spans: jax.Array,
    range_starts: jax.Array,
    phases,
    *,
    sub_len: int = PATCH_SUB_LEN,
    precision=lax.Precision.HIGHEST,
) -> dict[int, jax.Array]:
    """Multi-site generalization of :func:`conv6_phases_patch` (VERDICT r4
    #6): per-sample conv6 phase buffers built from a shared BACKBONE span's
    buffers by recomputing only the frames around each sample's k diff
    ranges. The workhorse of the consensus cohort's features-only fast path
    (pipeline/consensus.py), where hundreds of personal genomes share one
    per-gene backbone and differ at a handful of private sites each.

    Args:
        base_phases: {phase: (1 or N, F_ph, C)} backbone conv6 buffers.
        alt_spans: (N, span_len, 4) one-hot sample spans.
        range_starts: (N, K) int32 16-aligned sub-span starts from
            :func:`conv6_patch_sites_plan` — every frame whose receptive
            field touches a backbone/sample difference must be covered by
            some range. K is static; inactive slots may point anywhere
            (each patch recomputes frames from the SAMPLE's own span, so a
            superfluous patch writes back identical values).

    Returns {phase: (N, F_ph, C)} buffers equal (to fp reduction order) to
    ``conv6_phases(params, alt_spans, phases)``.
    """
    n, span_len, _ = alt_spans.shape
    k = range_starts.shape[1]
    phases = sorted(set(int(p) for p in phases))

    # gather the K sub-spans of every sample into one conv batch
    def slice_sample(x_i, s_i):
        return jax.vmap(lambda s: lax.dynamic_slice_in_dim(x_i, s, sub_len, axis=0))(s_i)

    subs = jax.vmap(slice_sample)(alt_spans, range_starts)  # (N, K, sub_len, 4)
    sub_ph = conv6_phases(
        params, subs.reshape(n * k, sub_len, subs.shape[-1]), phases, precision=precision
    )

    return _splice_patch_frames(base_phases, sub_ph, range_starts // CONV6_STRIDE, n, k, phases)


def _splice_patch_frames(base_phases, sub_ph, f0, n, k, phases):
    """Scatter per-range conv6 frames into (broadcast copies of) the
    backbone phase buffers at frame starts ``f0`` (N, K). Overlapping
    ranges write byte-equal values (every patch frame is the conv of the
    sample's own bases), so duplicate-index order is irrelevant; 'drop'
    guards the (host-prevented) out-of-range case."""
    out = {}
    for ph in phases:
        buf = base_phases[ph]
        if buf.shape[0] != n:
            buf = jnp.broadcast_to(buf, (n,) + buf.shape[-2:])
        patches = sub_ph[ph].reshape(n, k, -1, buf.shape[-1])  # (N, K, cnt, C)
        cnt = patches.shape[2]
        frame_idx = f0[:, :, None] + jnp.arange(cnt, dtype=f0.dtype)[None, None, :]
        n_idx = jnp.broadcast_to(jnp.arange(n, dtype=f0.dtype)[:, None, None], frame_idx.shape)
        out[ph] = buf.at[n_idx, frame_idx].set(patches.astype(buf.dtype), mode="drop")
    return out


def conv6_phases_patch_sites_c1(
    params: BelugaParams,
    base_c1: jax.Array,
    base_phases: dict[int, jax.Array],
    alt_spans: jax.Array,
    w0s: jax.Array,
    d0s: jax.Array,
    phases,
    *,
    sub_len: int = PATCH_SUB_LEN,
    precision=lax.Precision.HIGHEST,
) -> dict[int, jax.Array]:
    """Layered variant of :func:`conv6_phases_patch_sites` that reuses the
    BACKBONE's conv1 activations — conv0+conv1 are ~36% of the span's conv
    FLOPs and the raw kernel reruns them over every range's full sub-span.
    Here conv1 is recomputed only on a :data:`C1_PATCH_BASES`-wide slice
    around each diff range (the conv1 receptive field of the mutated
    bases); conv2..conv6 then run on (sub_len-14)-wide windows gathered
    from the patched conv1 buffer. Per-range FLOPs drop ~38%.

    **Measured NEGATIVE result on v5e (r5)** — the production path uses the
    raw kernel instead: at N=16, K=8 the phase computation took 39.4 ms
    here vs 29.4 ms raw vs 48.2 ms full forward. The per-sample conv1
    buffer (broadcast + scatter + per-range window gathers over
    (N, L-14, 320)) costs more in HBM traffic and scatter lowering than
    the ~4.5 GFLOP of conv1 it avoids recomputing. Kept exact-tested as
    the starting point for backends where gather/scatter is cheaper
    relative to matmul.

    Cross-range consistency is automatic: every window gather happens
    after ALL conv1 patches are scattered, so a range whose window
    overlaps a neighbor's mutated bases reads the neighbor's recomputed
    conv1 values, not the backbone's.

    Args:
        base_c1: (1 or N, span_len-14, C1) backbone conv1 activations
            (:func:`conv1_acts` of the backbone span).
        base_phases: {phase: (1 or N, F_ph, C)} backbone conv6 buffers.
        alt_spans: (N, span_len, 4) one-hot sample spans.
        w0s / d0s: (N, K) int32 ``(w0, d0)`` columns of
            :func:`conv6_patch_sites_plan`'s ranges; inactive slots 0.

    Returns {phase: (N, F_ph, C)} buffers equal (to fp reduction order) to
    ``conv6_phases(params, alt_spans, phases)``.
    """
    n, span_len, _ = alt_spans.shape
    k = w0s.shape[1]
    phases = sorted(set(int(p) for p in phases))
    win = sub_len - 14
    c1_out = C1_PATCH_BASES - 14

    # 1. conv1 recomputed from the sample's own bases around each range
    def slice_bases(x_i, s_i):
        return jax.vmap(lambda s: lax.dynamic_slice_in_dim(x_i, s, C1_PATCH_BASES, axis=0))(s_i)

    base_slices = jax.vmap(slice_bases)(alt_spans, d0s)  # (N, K, 80, 4)
    c1_patch = conv1_acts(
        params, base_slices.reshape(n * k, C1_PATCH_BASES, base_slices.shape[-1]), precision=precision
    ).reshape(n, k, c1_out, -1)

    buf = base_c1
    if buf.shape[0] != n:
        buf = jnp.broadcast_to(buf, (n,) + buf.shape[-2:])
    pos_idx = d0s[:, :, None] + jnp.arange(c1_out, dtype=d0s.dtype)[None, None, :]
    n_idx = jnp.broadcast_to(jnp.arange(n, dtype=d0s.dtype)[:, None, None], pos_idx.shape)
    c1 = buf.at[n_idx, pos_idx].set(c1_patch.astype(buf.dtype), mode="drop")

    # 2. per-range conv1 windows from the PATCHED buffer; 3. conv2..conv6
    def slice_c1(c_i, s_i):
        return jax.vmap(lambda s: lax.dynamic_slice_in_dim(c_i, s, win, axis=0))(s_i)

    wins = jax.vmap(slice_c1)(c1, w0s)  # (N, K, win, C1)
    sub_ph = conv6_from_conv1(
        params, wins.reshape(n * k, win, wins.shape[-1]), phases, precision=precision
    )
    return _splice_patch_frames(base_phases, sub_ph, w0s // CONV6_STRIDE, n, k, phases)


def _window_starts_by_phase(offsets) -> dict[int, list[tuple[int, int]]]:
    """{phase: [(output_index, start_frame), ...]} for the shift windows."""
    per_phase: dict[int, list[tuple[int, int]]] = {}
    for i, o in enumerate(int(o) for o in offsets):
        ph = (o // 4) % 4
        per_phase.setdefault(ph, []).append((i, (o // 4 - ph) // 4))
    return per_phase


def fc1_pre_from_phases(
    params: BelugaParams,
    phase_conv6: dict[int, jax.Array],
    offsets,
    *,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """fc1 pre-activations (no bias/relu) per window: (N, n_offsets, 2003).

    When the window starts within a phase are uniformly strided (true for
    the standard 200-bp shift grids), fc1 runs as one strided valid conv
    with kernel (106, 640, 2003) — the length-major fc1 matrix reshaped —
    avoiding the (N, n_offsets, 67840) gather.
    """
    offsets = [int(o) for o in offsets]
    n = next(iter(phase_conv6.values())).shape[0]
    dtype = next(iter(phase_conv6.values())).dtype
    fc1_w = params["fc1"]["w"].astype(dtype)

    h1_cols = [None] * len(offsets)
    fc1_kernel = fc1_w.reshape(106, -1, params["fc1"]["b"].shape[0])
    for ph, items in _window_starts_by_phase(offsets).items():
        starts = [s for _, s in items]
        order = sorted(range(len(starts)), key=lambda j: starts[j])
        s_sorted = [starts[j] for j in order]
        strides = {s_sorted[j + 1] - s_sorted[j] for j in range(len(s_sorted) - 1)}
        buf = phase_conv6[ph]
        if len(s_sorted) > 1 and len(strides) == 1 and min(strides) > 0:
            stride = strides.pop()
            sliced = lax.slice_in_dim(buf, s_sorted[0], buf.shape[1], axis=1)
            frames = lax.conv_general_dilated(
                sliced, fc1_kernel, (stride,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
            )  # (N, n_frames, 2003)
            for rank, j in enumerate(order):
                h1_cols[items[j][0]] = frames[:, rank, :]
        else:
            for (i, s) in items:
                win = lax.slice_in_dim(buf, s, s + 106, axis=1).reshape(n, -1)
                h1_cols[i] = jnp.dot(win, fc1_w, precision=precision)
    return jnp.stack(h1_cols, axis=1)  # (N, n_offsets, 2003)


def fc1_delta_from_phases(
    params: BelugaParams,
    ref_phases: dict[int, jax.Array],
    alt_phases: dict[int, jax.Array],
    patch_ranges: dict[int, tuple[int, int]],
    offsets,
    *,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Incremental fc1: the (N, n_offsets, 2003) pre-activation *delta*
    between alt and ref phase buffers that differ only inside
    ``patch_ranges`` (fc1 is linear before relu, so
    ``fc1_pre(alt) == fc1_pre(ref) + delta`` exactly). Cost is proportional
    to the ~20 patched conv6 frames instead of the full 106-frame windows.
    """
    offsets = [int(o) for o in offsets]
    n = next(iter(ref_phases.values())).shape[0]
    dtype = next(iter(ref_phases.values())).dtype
    fc1_kernel = params["fc1"]["w"].astype(dtype).reshape(106, -1, params["fc1"]["b"].shape[0])

    cols = [None] * len(offsets)
    for ph, items in _window_starts_by_phase(offsets).items():
        f_lo, f_hi = patch_ranges[ph]
        if f_hi <= f_lo:
            continue
        diff = (
            lax.slice_in_dim(alt_phases[ph], f_lo, f_hi, axis=1)
            - lax.slice_in_dim(ref_phases[ph], f_lo, f_hi, axis=1)
        )  # (N, P, 640)
        for (i, s) in items:
            a = max(f_lo, s)
            b = min(f_hi, s + 106)
            if b <= a:
                continue
            d = lax.slice_in_dim(diff, a - f_lo, b - f_lo, axis=1).reshape(n, -1)
            k = fc1_kernel[a - s : b - s].reshape(-1, fc1_kernel.shape[-1])
            cols[i] = jnp.dot(d, k, precision=precision)
    zero = jnp.zeros((n, fc1_kernel.shape[-1]), dtype)
    return jnp.stack([c if c is not None else zero for c in cols], axis=1)


def fc_head(
    params: BelugaParams,
    h1_pre: jax.Array,
    *,
    precision=lax.Precision.HIGHEST,
    logits: bool = False,
) -> jax.Array:
    """bias + relu + fc2 + sigmoid over (N, n_offsets, 2003) fc1 pre-acts."""
    dtype = h1_pre.dtype
    h = jax.nn.relu(h1_pre + params["fc1"]["b"].astype(dtype))
    out = (
        jnp.einsum("nok,km->nom", h, params["fc2"]["w"].astype(dtype), precision=precision)
        + params["fc2"]["b"].astype(dtype)
    )
    return out if logits else jax.nn.sigmoid(out)


def fc_from_phases(
    params: BelugaParams,
    phase_conv6: dict[int, jax.Array],
    offsets,
    *,
    precision=lax.Precision.HIGHEST,
    logits: bool = False,
) -> jax.Array:
    """Dense layers per window from the conv6 phase buffers."""
    h1 = fc1_pre_from_phases(params, phase_conv6, offsets, precision=precision)
    return fc_head(params, h1, precision=precision, logits=logits)


def beluga_forward_spans(
    params: BelugaParams,
    spans: jax.Array,
    offsets,
    *,
    precision=lax.Precision.HIGHEST,
    window_len: int = 2000,
    logits: bool = False,
) -> jax.Array:
    """Forward over 2,000-bp windows ``spans[:, o : o+2000, :]`` per offset.

    Args:
        spans: (N, span_len, 4) one-hot spans.
        offsets: static window start offsets (each a multiple of 4; the
            standard pipelines use multiples of 200).

    Returns:
        (N, n_offsets, 2002) track probabilities, matching
        ``beluga_forward`` applied per window.
    """
    if window_len != 2000:
        raise ValueError("beluga_forward_spans supports only the model's 2000-bp windows (fc1 consumes 106 conv6 frames)")
    offsets = [int(o) for o in offsets]
    for o in offsets:
        if o % 4 != 0:
            raise ValueError(f"offset {o} not aligned to pool1 stride 4")
    phases = {(o // 4) % 4 for o in offsets}
    phase_conv6 = conv6_phases(params, spans, phases, precision=precision)
    return fc_from_phases(params, phase_conv6, offsets, precision=precision, logits=logits)


def span_offsets_for_shifts(shifts) -> tuple[list[int], int]:
    """Map a shift enumeration to (window offsets within the span, span_len
    extra) — offset of shift s = s - min(shifts)."""
    shifts = [int(s) for s in shifts]
    lo = min(shifts)
    return [s - lo for s in shifts], max(shifts) - lo
