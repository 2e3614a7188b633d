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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..models.beluga import BelugaParams


def _conv_relu(x, p, precision):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
    )
    return jax.nn.relu(y + p["b"].astype(x.dtype))


def _pool4_from(x, phase: int):
    """Max-pool width/stride 4 starting at ``phase`` (floor remainder drop)."""
    n, l, c = x.shape
    usable = ((l - phase) // 4) * 4
    return jnp.max(x[:, phase : phase + usable, :].reshape(n, usable // 4, 4, c), axis=2)


def beluga_forward_spans(
    params: BelugaParams,
    spans: jax.Array,
    offsets,
    *,
    precision=lax.Precision.HIGHEST,
    window_len: int = 2000,
    logits: bool = False,
) -> jax.Array:
    """Forward over windows ``spans[:, o : o+window_len, :]`` for each offset.

    Args:
        spans: (N, span_len, 4) one-hot spans.
        offsets: static window start offsets (each a multiple of 4; the
            standard pipelines use multiples of 200).

    Returns:
        (N, n_offsets, 2002) track probabilities, matching
        ``beluga_forward`` applied per window.
    """
    offsets = [int(o) for o in offsets]
    for o in offsets:
        if o % 4 != 0:
            raise ValueError(f"offset {o} not aligned to pool1 stride 4")

    h = _conv_relu(spans, params["conv0"], precision)
    h = _conv_relu(h, params["conv1"], precision)  # (N, span-14, 320)
    p1 = _pool4_from(h, 0)  # window w: p1[o//4 : o//4+496]
    h = _conv_relu(p1, params["conv2"], precision)
    h = _conv_relu(h, params["conv3"], precision)  # window w: [o//4 : o//4+482]

    # pool2 phases: offset//4 mod 4
    phases = sorted({(o // 4) % 4 for o in offsets})
    phase_conv6 = {}
    for ph in phases:
        p2 = _pool4_from(h, ph)
        g = _conv_relu(p2, params["conv4"], precision)
        g = _conv_relu(g, params["conv5"], precision)
        phase_conv6[ph] = g  # window w: [ (o//4 - ph)//4 : +106 ]

    n = spans.shape[0]
    fc1_w = params["fc1"]["w"].astype(h.dtype)

    # dense-1 applied per window. When the starts within a pooling phase are
    # uniformly strided (always true for the standard 200-bp shift grids),
    # fc1 runs as ONE strided valid convolution over the phase buffer with
    # kernel (106, 640, 2003) — the length-major fc1 matrix reshaped — which
    # avoids materializing the (N, n_offsets, 67840) gather.
    per_phase_starts: dict[int, list[tuple[int, int]]] = {}
    for i, o in enumerate(offsets):
        ph = (o // 4) % 4
        per_phase_starts.setdefault(ph, []).append((i, (o // 4 - ph) // 4))

    h1_cols = [None] * len(offsets)
    fc1_kernel = fc1_w.reshape(106, -1, params["fc1"]["b"].shape[0])
    for ph, items in per_phase_starts.items():
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
    h = jnp.stack(h1_cols, axis=1)  # (N, n_offsets, 2003)
    h = jax.nn.relu(h + params["fc1"]["b"].astype(h.dtype))
    out = (
        jnp.einsum("nok,km->nom", h, params["fc2"]["w"].astype(h.dtype), precision=precision)
        + params["fc2"]["b"].astype(h.dtype)
    )
    return out if logits else jax.nn.sigmoid(out)


def span_offsets_for_shifts(shifts, *, stride_origin: int | None = None) -> tuple[list[int], int]:
    """Map a shift enumeration to (window offsets within the span, span_len
    extra) — offset of shift s = s - min(shifts)."""
    shifts = [int(s) for s in shifts]
    lo = min(shifts)
    return [s - lo for s in shifts], max(shifts) - lo
