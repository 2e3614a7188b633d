"""Sharded Beluga inference engine.

Replaces the reference's per-batch ``.cuda()/.cpu()`` loop
(chromatin.py:265-279) with a mesh-sharded, fixed-shape jitted pipeline:

- host ships compact **int8 base codes** (N, 2000) — 16x less transfer
  than float32 one-hot — and one-hots on device;
- the batch axis is sharded over the mesh's data axis, params replicated
  (Beluga is ~150M params; fits every core);
- batches are padded to a fixed shape so XLA compiles exactly once;
- reverse-complement is generated on device (a channel/position flip of the
  one-hot tensor) and optionally averaged on device;
- up to ``pipeline_depth`` batches are kept in flight so host<->device
  transfers overlap compute (JAX dispatch is async; fetching is deferred);
- outputs can be fetched as float16 — sigmoid track probabilities lose
  nothing and device->host bytes halve;
- the gene path can apply the decay-basis projection **on device**
  (``predict_and_project``), shrinking per-gene output 20x
  (200x2002 preds -> 10x2002 features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.beluga import beluga_forward
from ..ops.spans import (
    PATCH_SUB_LEN,
    beluga_forward_spans,
    conv6_patch_ranges,
    conv6_phases,
    conv6_phases_patch,
    conv6_phases_patch_sites,
    fc1_delta_from_phases,
    fc1_pre_from_phases,
    fc_head,
    fc_from_phases,
)
from ..utils.compile_cache import enable_compile_cache
from .mesh import DATA_AXIS, local_mesh


def onehot_from_codes(codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(N, L) int codes -> (N, L, 4); code 4 (N) one-hots to zeros."""
    return jax.nn.one_hot(codes, 4, dtype=dtype)


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """Pack two int8 base codes (0..4) per byte for host->device transfer
    (2x fewer bytes over the wire). Pads odd lengths with code 4 (N)."""
    n, l = codes.shape
    if l % 2:
        codes = np.concatenate([codes, np.full((n, 1), 4, np.int8)], axis=1)
    # explicit dims (not -1): reshape(-1) cannot infer on zero-size batches
    pairs = codes.reshape(n, (l + l % 2) // 2, 2).astype(np.uint8)
    return pairs[:, :, 0] * 16 + pairs[:, :, 1]


def unpack_codes(packed: jax.Array, length: int) -> jax.Array:
    """Device-side inverse of :func:`pack_codes` -> (N, length) int8 codes."""
    hi = packed // 16
    lo = packed % 16
    codes = jnp.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)
    return codes[:, :length].astype(jnp.int8)


def pack_codes2(codes: np.ndarray):
    """Pack four base codes per byte (2 bits/base — the information content
    of DNA) for host->device transfer; N bases (code 4) are carried in a
    sparse (rows, cols) sideband since real genomes contain almost none in
    mappable regions. Returns (packed (N, ceil(L/4)) uint8, rows, cols)."""
    n, l = codes.shape
    rows, cols = np.nonzero(codes == 4)
    c = np.where(codes == 4, 0, codes).astype(np.uint8)
    pad = (-l) % 4
    if pad:
        c = np.concatenate([c, np.zeros((n, pad), np.uint8)], axis=1)
    # explicit dims (not -1): reshape(-1) cannot infer on zero-size batches
    q = c.reshape(n, (l + pad) // 4, 4)
    packed = (q[:, :, 0] << 6) | (q[:, :, 1] << 4) | (q[:, :, 2] << 2) | q[:, :, 3]
    return packed, rows.astype(np.int32), cols.astype(np.int32)


def unpack_codes2(packed: jax.Array, length: int, n_rows: jax.Array, n_cols: jax.Array) -> jax.Array:
    """Device-side inverse of :func:`pack_codes2`; sideband entries padded
    with out-of-range rows are dropped by the scatter."""
    b = packed
    c = jnp.stack([(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3], axis=-1)
    c = c.reshape(b.shape[0], -1)[:, :length].astype(jnp.int8)
    return c.at[n_rows, n_cols].set(jnp.int8(4), mode="drop")


def rc_onehot(x: jax.Array) -> jax.Array:
    """Reverse complement of a one-hot batch: flip positions and channels
    (valid under AGCT channel order; reference expecto_utils.py:37)."""
    return x[:, ::-1, ::-1]


def fp32_wire_kw(runner) -> dict:
    """``predict_codes`` kwargs forcing an fp32 wire on runners that would
    otherwise fetch fp16 — host-side ALT - REF differencing must never ride
    independently fp16-rounded sides (ADVICE r3). Duck-typed window-only
    runners (tests' FakeRunner pattern: no ``out_dtype`` attribute, plain
    fp32 outputs) get no extra kwarg, keeping the minimal
    ``predict_codes(codes, average_rc=...)`` contract intact."""
    if np.dtype(getattr(runner, "out_dtype", np.float32)) != np.float32:
        return {"out_dtype": np.float32}
    return {}


class BelugaRunner:
    """Fixed-shape, mesh-sharded Beluga forward engine.

    Args:
        params: Beluga pytree (numpy or jax arrays).
        batch_size: per-call global batch (rounded up to a mesh multiple).
        mesh: 1-D device mesh; defaults to all local devices.
        compute_dtype: jnp.float32 (parity) or jnp.bfloat16 (throughput).
        precision: matmul precision for the fp32 path.
        out_dtype: dtype fetched to host (np.float32 parity / np.float16
            production — halves device->host traffic).
        pipeline_depth: max batches in flight before fetching.
    """

    def __init__(
        self,
        params,
        batch_size: int = 1024,
        mesh: Mesh | None = None,
        compute_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        out_dtype=np.float32,
        pipeline_depth: int = 4,
    ):
        enable_compile_cache()
        self.mesh = mesh or local_mesh()  # addressable devices: host-local inputs/fetches
        n_dev = self.mesh.devices.size
        self.batch_size = -(-batch_size // n_dev) * n_dev
        self.compute_dtype = compute_dtype
        self.precision = precision
        self.out_dtype = np.dtype(out_dtype)
        self.pipeline_depth = max(int(pipeline_depth), 1)

        replicated = NamedSharding(self.mesh, P())
        self.params = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a, dtype=compute_dtype), params), replicated
        )
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        jnp_out = jnp.float16 if self.out_dtype == np.float16 else jnp.float32

        @functools.partial(jax.jit, static_argnames=("with_rc", "out"), out_shardings=self._batch_sharding)
        def _forward(params, codes, with_rc: bool, out=None):
            # `out`: optional fetch-dtype override (jnp dtype). The serving
            # window-fallback path forces float32 here so its HOST-side
            # ALT - REF differencing never operates on independently
            # fp16-rounded sides (ADVICE r3).
            o = jnp_out if out is None else out
            x = onehot_from_codes(codes, dtype=compute_dtype)
            if with_rc:
                y = beluga_forward(params, x, precision=precision).astype(jnp.float32)
                y_rc = beluga_forward(params, rc_onehot(x), precision=precision).astype(jnp.float32)
                return ((y + y_rc) * 0.5).astype(o)
            return beluga_forward(params, x, precision=precision).astype(o)

        self._forward = _forward

        @functools.partial(jax.jit, static_argnames=("n_shifts",))
        def _forward_project(params, codes, pos_weights, n_shifts: int):
            # codes: (G*S, L); pos_weights: (B, S). Returns (G, B*M) at jnp_out.
            x = onehot_from_codes(codes, dtype=compute_dtype)
            y = beluga_forward(params, x, precision=precision).astype(jnp.float32)
            y_rc = beluga_forward(params, rc_onehot(x), precision=precision).astype(jnp.float32)
            preds = ((y + y_rc) * 0.5).reshape(-1, n_shifts, y.shape[-1])  # (G, S, M)
            feats = jnp.einsum("bs,gsm->gbm", pos_weights.astype(jnp.float32), preds, precision=precision)
            # features ride the configured fetch dtype (fp16 wire in
            # production: ~5e-4 relative rounding, host arrays stay fp32)
            return feats.reshape(preds.shape[0], -1).astype(jnp_out)

        self._forward_project = _forward_project

        @functools.partial(jax.jit, static_argnames=("offsets", "rc_mode"))
        def _forward_spans(params, span_codes, offsets, rc_mode: str):
            # span_codes: (N, span_len) -> (N, n_offsets, 2002), conv work
            # shared across the overlapping shift windows (ops/spans.py)
            x = onehot_from_codes(span_codes, dtype=compute_dtype)
            y = beluga_forward_spans(params, x, offsets, precision=precision).astype(jnp.float32)
            if rc_mode == "none":
                return y.astype(jnp_out)
            extra = span_codes.shape[1] - 2000
            rc_offsets = tuple(extra - o for o in offsets)
            y_rc_mirror = beluga_forward_spans(params, x[:, ::-1, ::-1], rc_offsets, precision=precision).astype(jnp.float32)
            # rc window of offset o sits at mirrored offset in the RC span;
            # rc_offsets[i] corresponds to offsets[i] directly
            if rc_mode == "average":
                return ((y + y_rc_mirror) * 0.5).astype(jnp_out)
            if rc_mode == "concat":
                return jnp.stack([y, y_rc_mirror], axis=1).astype(jnp_out)  # (N, 2, O, M)
            raise ValueError(rc_mode)

        self._forward_spans = _forward_spans

        @functools.partial(jax.jit, static_argnames=("offsets", "rc_mode", "span_len"))
        def _forward_spans_packed2(params, packed, n_rows, n_cols, offsets, rc_mode, span_len):
            codes = unpack_codes2(packed, span_len, n_rows, n_cols)
            return _forward_spans(params, codes, offsets, rc_mode)

        self._forward_spans_packed2 = _forward_spans_packed2

        @functools.partial(jax.jit, static_argnames=("offsets",))
        def _forward_spans_project(params, span_codes, pos_weights, offsets):
            x = onehot_from_codes(span_codes, dtype=compute_dtype)
            y = beluga_forward_spans(params, x, offsets, precision=precision).astype(jnp.float32)
            extra = span_codes.shape[1] - 2000
            rc_offsets = tuple(extra - o for o in offsets)
            y_rc = beluga_forward_spans(params, x[:, ::-1, ::-1], rc_offsets, precision=precision).astype(jnp.float32)
            preds = (y + y_rc) * 0.5  # (N, O, M)
            feats = jnp.einsum("bs,nsm->nbm", pos_weights.astype(jnp.float32), preds, precision=precision)
            return feats.reshape(preds.shape[0], -1).astype(jnp_out)

        self._forward_spans_project = _forward_spans_project

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len"))
        def _forward_spans_project_packed2(params, packed, n_rows, n_cols, pos_weights, offsets, span_len):
            codes = unpack_codes2(packed, span_len, n_rows, n_cols)
            return _forward_spans_project(params, codes, pos_weights, offsets)

        self._forward_spans_project_packed2 = _forward_spans_project_packed2

        @functools.partial(jax.jit, static_argnames=("offsets",))
        def _backbone_phases(params, span_codes, offsets):
            # (1, L) backbone codes -> (fwd, rc) conv6 phase-buffer dicts,
            # computed ONCE per gene and reused by every patched sample chunk
            x = onehot_from_codes(span_codes, dtype=compute_dtype)
            extra = span_codes.shape[1] - 2000
            rc_offsets = tuple(extra - o for o in offsets)
            ph_f = conv6_phases(params, x, {(o // 4) % 4 for o in offsets}, precision=precision)
            ph_r = conv6_phases(
                params, x[:, ::-1, ::-1], {(o // 4) % 4 for o in rc_offsets}, precision=precision
            )
            return ph_f, ph_r

        self._backbone_phases = _backbone_phases

        @functools.partial(jax.jit, static_argnames=("offsets", "sub_len"))
        def _forward_spans_project_patch(
            params, ph_f, ph_r, sample_spans, starts_f, starts_r, pos_weights, offsets, sub_len
        ):
            # Cohort fast path: per-sample conv6 buffers are the BACKBONE's
            # with only the frames around each sample's diff ranges
            # recomputed from raw-base sub-spans
            # (ops/spans.conv6_phases_patch_sites — the conv1-reusing _c1
            # variant measured SLOWER on v5e, see its docstring); the dense
            # layers and the decay projection then run per sample as in
            # _forward_spans_project. starts_*: (N, K, 2) int32 (w0, d0);
            # this kernel consumes w0 only.
            x = onehot_from_codes(sample_spans, dtype=compute_dtype)
            extra = sample_spans.shape[1] - 2000
            rc_offsets = tuple(extra - o for o in offsets)
            pf = conv6_phases_patch_sites(
                params, ph_f, x, starts_f[..., 0],
                {(o // 4) % 4 for o in offsets}, sub_len=sub_len, precision=precision,
            )
            pr = conv6_phases_patch_sites(
                params, ph_r, x[:, ::-1, ::-1], starts_r[..., 0],
                {(o // 4) % 4 for o in rc_offsets}, sub_len=sub_len, precision=precision,
            )
            y = fc_from_phases(params, pf, offsets, precision=precision).astype(jnp.float32)
            y_rc = fc_from_phases(params, pr, rc_offsets, precision=precision).astype(jnp.float32)
            preds = (y + y_rc) * 0.5
            feats = jnp.einsum(
                "bs,nsm->nbm", pos_weights.astype(jnp.float32), preds, precision=precision
            )
            return feats.reshape(preds.shape[0], -1).astype(jnp_out)

        self._forward_spans_project_patch = _forward_spans_project_patch

        @functools.partial(jax.jit, static_argnames=("offsets",))
        def _forward_spans_pair_diff(params, ref_spans, alt_spans, offsets):
            # h5-contract wire: (ref, diff) each (R, 2, S, M) ([:, 0] fwd,
            # [:, 1] rc). diff = alt - ref is computed in fp32 ON DEVICE, so
            # an fp16 fetch keeps diff's RELATIVE precision — host-side
            # differencing of independently fp16-rounded sides would bury
            # ~1e-3-scale chromatin effects (the r3 revert's hazard); the
            # host reconstructs alt = ref + diff in fp32
            # (reference contract: chromatin.py:282-286).
            def concat2(spans):
                x = onehot_from_codes(spans, dtype=compute_dtype)
                y = beluga_forward_spans(params, x, offsets, precision=precision).astype(jnp.float32)
                extra = spans.shape[1] - 2000
                rc_off = tuple(extra - o for o in offsets)
                y_rc = beluga_forward_spans(
                    params, x[:, ::-1, ::-1], rc_off, precision=precision
                ).astype(jnp.float32)
                return jnp.stack([y, y_rc], axis=1)

            R = concat2(ref_spans)
            A = concat2(alt_spans)
            # ONE stacked output: (R, 2[ref|diff], 2[fwd|rc], S, M). The
            # relay's per-stream bandwidth rises with transfer size
            # (scripts/probe_relay.py), so one 2x array fetches faster than
            # two half-size fetches.
            return jnp.stack([R, A - R], axis=1).astype(jnp_out)

        self._forward_spans_pair_diff = _forward_spans_pair_diff

        @functools.partial(jax.jit, static_argnames=("offsets",))
        def _forward_spans_diff_only(params, ref_spans, alt_spans, offsets):
            # legacy-contract wire: the original-ExPecto h5 format stores
            # only pred = diff (example/*.diff.h5), so ref tracks never
            # need to leave the device — HALF the fetch of the pair-diff
            # wire on this fetch-bound path. diff stays fp32-differenced
            # on device before the cast (same cancellation-safety).
            def diff2(xr, xa, offs):
                yr = beluga_forward_spans(params, xr, offs, precision=precision).astype(jnp.float32)
                ya = beluga_forward_spans(params, xa, offs, precision=precision).astype(jnp.float32)
                return ya - yr

            x_ref = onehot_from_codes(ref_spans, dtype=compute_dtype)
            x_alt = onehot_from_codes(alt_spans, dtype=compute_dtype)
            extra = ref_spans.shape[1] - 2000
            rc_off = tuple(extra - o for o in offsets)
            d = diff2(x_ref, x_alt, offsets)
            d_rc = diff2(x_ref[:, ::-1, ::-1], x_alt[:, ::-1, ::-1], rc_off)
            return jnp.stack([d, d_rc], axis=1).astype(jnp_out)  # (R, 2[fwd|rc], S, M)

        self._forward_spans_diff_only = _forward_spans_diff_only

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len"))
        def _forward_spans_diff_only_packed2(params, packed, n_rows, n_cols, offsets, span_len):
            codes = unpack_codes2(packed, span_len, n_rows, n_cols)
            pair = codes.reshape(-1, 2, codes.shape[1])
            return _forward_spans_diff_only(params, pair[:, 0], pair[:, 1], offsets)

        self._forward_spans_diff_only_packed2 = _forward_spans_diff_only_packed2

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len"))
        def _forward_spans_pair_diff_packed2(params, packed, n_rows, n_cols, offsets, span_len):
            codes = unpack_codes2(packed, span_len, n_rows, n_cols)
            pair = codes.reshape(-1, 2, codes.shape[1])
            return _forward_spans_pair_diff(params, pair[:, 0], pair[:, 1], offsets)

        self._forward_spans_pair_diff_packed2 = _forward_spans_pair_diff_packed2

        def _pair_span_preds(params, spans, offsets):
            # fwd/RC-averaged (N, S, M) track predictions of one span batch;
            # shared by the pair kernels below
            x = onehot_from_codes(spans, dtype=compute_dtype)
            y = beluga_forward_spans(params, x, offsets, precision=precision).astype(jnp.float32)
            extra = spans.shape[1] - 2000
            rc_off = tuple(extra - o for o in offsets)
            y_rc = beluga_forward_spans(params, x[:, ::-1, ::-1], rc_off, precision=precision).astype(jnp.float32)
            return (y + y_rc) * 0.5

        @functools.partial(jax.jit, static_argnames=("offsets",))
        def _score_spans(params, ref_spans, alt_spans, basis, W, bias, offsets):
            # Fully fused SED serving: spans -> shared-conv windows -> fwd/RC
            # average -> per-(variant,gene) decay features -> all expression
            # models in one matmul. Ships only per-model scalars off device.
            #   basis: (S, N, B) floored decay basis (variant path)
            #   W: (B*M, K) stacked model weights; bias: (K,) incl base_score
            def feats(p):
                f = jnp.einsum("snb,nsm->nbm", basis.astype(jnp.float32), p, precision=precision)
                return f.reshape(p.shape[0], -1)

            REF = jnp.dot(feats(_pair_span_preds(params, ref_spans, offsets)), W, precision=precision) + bias
            ALT = jnp.dot(feats(_pair_span_preds(params, alt_spans, offsets)), W, precision=precision) + bias
            # wire format: (REF, SED) at out_dtype. SED = ALT - REF computed
            # in fp32 on device keeps its RELATIVE precision through an fp16
            # fetch; rounding REF and ALT separately would put ~1e-3 absolute
            # noise on their small difference
            return REF.astype(jnp_out), (ALT - REF).astype(jnp_out)

        self._score_spans = _score_spans

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len"))
        def _score_spans_pair_packed2_rows(
            params, packed, n_rows, n_cols, basis_rows, row_uidx, W, bias, offsets, span_len
        ):
            # Pair kernel over (variant, gene)-expanded rows sharing variants
            # (indels associated with several genes): the TWO conv stacks run
            # once per UNIQUE variant; rows gather their variant's tracks on
            # device and score their own decay basis.
            #   basis_rows: (S, R, B); row_uidx: (R,) index into unique pairs
            codes = unpack_codes2(packed, span_len, n_rows, n_cols)
            pair = codes.reshape(-1, 2, codes.shape[1])
            p_ref = _pair_span_preds(params, pair[:, 0], offsets)
            p_alt = _pair_span_preds(params, pair[:, 1], offsets)

            def feats(p):
                f = jnp.einsum("srb,rsm->rbm", basis_rows.astype(jnp.float32), p, precision=precision)
                return f.reshape(p.shape[0], -1)

            REF = jnp.dot(feats(jnp.take(p_ref, row_uidx, axis=0)), W, precision=precision) + bias
            ALT = jnp.dot(feats(jnp.take(p_alt, row_uidx, axis=0)), W, precision=precision) + bias
            return REF.astype(jnp_out), (ALT - REF).astype(jnp_out)

        self._score_spans_pair_packed2_rows = _score_spans_pair_packed2_rows

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len"))
        def _score_spans_pair_packed2(params, packed, n_rows, n_cols, basis, W, bias, offsets, span_len):
            # Transfer-optimized pair serving (indels: the alt span is
            # crop-shifted, so no on-device splice applies): BOTH spans ship
            # 2-bit packed, interleaved [ref_i, alt_i] per variant — 4x less
            # wire than the unpacked pair path. Unpack once, deinterleave
            # with a local reshape (pairs never straddle device shards), and
            # reuse the fused pair kernel unchanged (bit-identical results).
            codes = unpack_codes2(packed, span_len, n_rows, n_cols)  # (2R, L)
            pair = codes.reshape(-1, 2, codes.shape[1])
            return _score_spans(params, pair[:, 0], pair[:, 1], basis, W, bias, offsets)

        self._score_spans_pair_packed2 = _score_spans_pair_packed2

        def _preds_from_ref(params, ref, alt_allele, offsets, span_len, mutpos):
            # Transfer-optimized + incremental serving core: one packed span
            # per variant; the alt span is spliced on device (alt_allele:
            # (N, A) codes, -1 keeps the reference base), and the alt conv
            # stack recomputes only the ~20 conv6 frames whose receptive
            # field covers the variant (ops/spans.conv6_phases_patch) — ~80%
            # of the alt allele's conv FLOPs are reused from ref. Returns the
            # fwd/RC-averaged (N, S, 2002) track predictions for ref and alt.
            a_len = alt_allele.shape[1]
            patch = jax.lax.dynamic_slice_in_dim(ref, mutpos, a_len, axis=1)
            patch = jnp.where(alt_allele >= 0, alt_allele.astype(jnp.int8), patch)
            alt = jax.lax.dynamic_update_slice_in_dim(ref, patch, mutpos, axis=1)

            x_ref = onehot_from_codes(ref, dtype=compute_dtype)
            x_alt = onehot_from_codes(alt, dtype=compute_dtype)
            extra = span_len - 2000
            rc_offsets = tuple(extra - o for o in offsets)
            phases_f = {(o // 4) % 4 for o in offsets}
            phases_r = {(o // 4) % 4 for o in rc_offsets}
            mut_rc = span_len - mutpos - a_len

            ph_ref_f = conv6_phases(params, x_ref, phases_f, precision=precision)
            ph_ref_r = conv6_phases(params, x_ref[:, ::-1, ::-1], phases_r, precision=precision)
            ph_alt_f = conv6_phases_patch(params, ph_ref_f, x_alt, mutpos, a_len, phases_f, precision=precision)
            ph_alt_r = conv6_phases_patch(
                params, ph_ref_r, x_alt[:, ::-1, ::-1], mut_rc, a_len, phases_r, precision=precision
            )

            # fc1 is linear pre-relu, so the alt windows' pre-activations are
            # ref's plus a delta over only the ~20 patched conv6 frames
            # (ops/spans.fc1_delta_from_phases) — the ref fc1 conv runs once
            # per orientation instead of twice.
            ranges_f = conv6_patch_ranges(mutpos, a_len, phases_f, {p: ph_ref_f[p].shape[1] for p in ph_ref_f})
            ranges_r = conv6_patch_ranges(mut_rc, a_len, phases_r, {p: ph_ref_r[p].shape[1] for p in ph_ref_r})
            h_ref_f = fc1_pre_from_phases(params, ph_ref_f, offsets, precision=precision)
            h_ref_r = fc1_pre_from_phases(params, ph_ref_r, rc_offsets, precision=precision)
            d_f = fc1_delta_from_phases(params, ph_ref_f, ph_alt_f, ranges_f, offsets, precision=precision)
            d_r = fc1_delta_from_phases(params, ph_ref_r, ph_alt_r, ranges_r, rc_offsets, precision=precision)

            def preds(h_fwd, h_rc):
                y = fc_head(params, h_fwd, precision=precision).astype(jnp.float32)
                y_rc = fc_head(params, h_rc, precision=precision).astype(jnp.float32)
                return (y + y_rc) * 0.5

            return preds(h_ref_f, h_ref_r), preds(h_ref_f + d_f, h_ref_r + d_r)

        def _score_from_ref(params, ref, alt_allele, basis, W, bias, offsets, span_len, mutpos):
            p_ref, p_alt = _preds_from_ref(params, ref, alt_allele, offsets, span_len, mutpos)

            def feats(p):
                f = jnp.einsum("snb,nsm->nbm", basis.astype(jnp.float32), p, precision=precision)
                return f.reshape(p.shape[0], -1)

            REF = jnp.dot(feats(p_ref), W, precision=precision) + bias
            ALT = jnp.dot(feats(p_alt), W, precision=precision) + bias
            return REF.astype(jnp_out), (ALT - REF).astype(jnp_out)

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len", "mutpos"))
        def _score_spans_packed(params, packed_ref, alt_allele, basis, W, bias, offsets, span_len, mutpos):
            ref = unpack_codes(packed_ref, span_len)
            return _score_from_ref(params, ref, alt_allele, basis, W, bias, offsets, span_len, mutpos)

        self._score_spans_packed = _score_spans_packed

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len", "mutpos"))
        def _score_spans_packed2(params, packed_ref, n_rows, n_cols, alt_allele, basis, W, bias, offsets, span_len, mutpos):
            ref = unpack_codes2(packed_ref, span_len, n_rows, n_cols)
            return _score_from_ref(params, ref, alt_allele, basis, W, bias, offsets, span_len, mutpos)

        self._score_spans_packed2 = _score_spans_packed2

        @functools.partial(jax.jit, static_argnames=("offsets", "span_len", "mutpos"))
        def _score_spans_packed2_rows(
            params, packed_ref, n_rows, n_cols, alt_allele, basis_rows, row_uidx,
            W, bias, offsets, span_len, mutpos,
        ):
            # Variant-gene expanded serving: the conv/fc stack runs once per
            # UNIQUE variant span; per-(variant, gene) rows differ only in
            # the decay basis, so row predictions are an on-device gather.
            #   basis_rows: (S, R, B); row_uidx: (R,) unique-variant index
            ref = unpack_codes2(packed_ref, span_len, n_rows, n_cols)
            p_ref, p_alt = _preds_from_ref(params, ref, alt_allele, offsets, span_len, mutpos)

            def feats(p):
                f = jnp.einsum("srb,rsm->rbm", basis_rows.astype(jnp.float32), p, precision=precision)
                return f.reshape(p.shape[0], -1)

            REF = jnp.dot(feats(jnp.take(p_ref, row_uidx, axis=0)), W, precision=precision) + bias
            ALT = jnp.dot(feats(jnp.take(p_alt, row_uidx, axis=0)), W, precision=precision) + bias
            return REF.astype(jnp_out), (ALT - REF).astype(jnp_out)

        self._score_spans_packed2_rows = _score_spans_packed2_rows

    @property
    def _basis_wire_dtype(self):
        # decay-basis weights are in (0, 1]; fp16 transfer loses nothing
        # beyond the production mode's bf16 matmul precision. Parity mode
        # (fp32 fetch) keeps an fp32 wire.
        return np.float16 if self.out_dtype == np.float16 else np.float32

    @staticmethod
    def _write_ref_sed(REF: np.ndarray, ALT: np.ndarray, SED: np.ndarray):
        """write() for the fused scoring paths: the wire carries (REF, SED);
        SED is stored exactly as the device computed it (fp32 before the
        fetch cast) and ALT is reconstructed as REF + SED in fp32 on host."""

        def write(key, r0, pair):
            s0 = key[0] if isinstance(key, tuple) else key
            rr, ss = pair
            ref = np.asarray(rr)[:r0].astype(np.float32)
            sed = np.asarray(ss)[:r0].astype(np.float32)
            REF[s0 : s0 + r0] = ref
            SED[s0 : s0 + r0] = sed
            ALT[s0 : s0 + r0] = ref + sed

        return write

    #: device->host fetch worker threads. The axon relay tops out at
    #: ~25-40 MB/s on ONE stream but up to ~60 MB/s aggregate on concurrent
    #: fetches (scripts/probe_relay.py); fetch-bound paths (full-track h5
    #: contract, consensus cohorts) gain ~1.5x from overlapping fetches.
    #: THREE workers (r5): a worker also does the fp32 cast + h5 write
    #: after its fetch, so a third worker keeps two fetches in flight
    #: during those windows. Interleaved A/B vs 2 workers measured
    #: parity-to-slightly-better (medians 187.1 vs 186.2 v/s, best 196.1
    #: vs 194.2; an early sequential measurement's +11% was phase noise) —
    #: kept at 3 because the cast/write cover is free and can only matter
    #: more on faster links.
    FETCH_WORKERS = 3

    def _run_pipelined(self, jobs, write):
        """Drain a stream of (start, real, device_result) with up to
        ``pipeline_depth`` results in flight; ``write(start, real, result)``
        fetches to host.

        Fetches run on a small thread pool so two device->host streams are
        in flight at once (the relay's aggregate bandwidth is ~1.5x one
        stream's). Writers must touch disjoint output slices — every caller
        writes ``out[start : start + real]`` — so concurrent completion is
        safe; exceptions propagate in submission order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if self.FETCH_WORKERS <= 1:
            in_flight = deque()
            for job in jobs:
                in_flight.append(job)
                if len(in_flight) >= self.pipeline_depth:
                    write(*in_flight.popleft())
            for job in in_flight:
                write(*job)
            return

        with ThreadPoolExecutor(max_workers=self.FETCH_WORKERS) as ex:
            pending = deque()
            for job in jobs:
                pending.append(ex.submit(write, *job))
                if len(pending) >= self.pipeline_depth:
                    pending.popleft().result()
            while pending:
                pending.popleft().result()

    def _batches(self, codes: np.ndarray):
        return self._span_batches(codes, self.batch_size)

    def predict_codes(self, codes: np.ndarray, *, average_rc: bool = False, out_dtype=None) -> np.ndarray:
        """Run Beluga over int8 base codes (N, 2000) -> (N, 2002).

        ``average_rc=True`` computes the forward/reverse-complement average on
        device ((fwd + rc)/2, the consumer-side operation of
        predict.py:183-194) without shipping 2N windows.

        ``out_dtype`` overrides the runner's fetch dtype for this call —
        callers that difference the predictions on host pass ``np.float32``
        so small effects never ride independently fp16-rounded sides.
        """
        codes = np.asarray(codes, dtype=np.int8)
        n = codes.shape[0]
        fetch_dtype = self.out_dtype if out_dtype is None else np.dtype(out_dtype)
        # a no-op override keeps out=None so the same XLA program serves both
        # call styles (out is a static argname — a distinct value would
        # recompile the full forward for a bit-identical program)
        jnp_over = (
            None
            if fetch_dtype == self.out_dtype
            else (jnp.float16 if fetch_dtype == np.float16 else jnp.float32)
        )
        out = np.empty((n, 2002), dtype=fetch_dtype)

        def jobs():
            for start, real, chunk in self._batches(codes):
                dev = jax.device_put(chunk, self._batch_sharding)
                yield start, real, self._forward(self.params, dev, with_rc=average_rc, out=jnp_over)

        self._run_pipelined(jobs(), lambda s, r, y: out.__setitem__(slice(s, s + r), np.asarray(y)[:r]))
        return out

    #: per-chunk N-sideband budget; batches denser than this fall back to
    #: wider packing (N-padded chromosome-edge consensus spans hit this)
    PACK2_SIDE_BUDGET = 16384

    def _pack2_plan(self, span_codes: np.ndarray, rows: int):
        """2-bit packing plan for chunked span transfer, or None when the
        batch is too N-dense for the sparse sideband."""
        n = span_codes.shape[0]
        packed, n_rows, n_cols = pack_codes2(span_codes)
        starts = list(range(0, n, rows))
        bounds = [
            (np.searchsorted(n_rows, s), np.searchsorted(n_rows, min(s + rows, n)))
            for s in starts
        ]
        max_ns = max((int(b - a) for a, b in bounds), default=0)
        if max_ns > self.PACK2_SIDE_BUDGET:
            return None
        # minimum bucket 1024: realistic N densities always land in the same
        # bucket, so warmup calls compile the same kernel signature as the
        # timed/production calls (the 8 KB sideband transfer is negligible)
        side = max(1024, 1 << (max_ns - 1).bit_length()) if max_ns > 0 else 1024
        return packed, n_rows, n_cols, starts, bounds, side

    def _pack2_chunks(self, plan, rows: int, n: int):
        """Yield (start, real, packed_chunk, rows_local, cols_local) per chunk."""
        packed, n_rows, n_cols, starts, bounds, side = plan
        for start, (i0, i1) in zip(starts, bounds):
            end = min(start + rows, n)
            real = end - start
            p_chunk = np.pad(packed[start:end], ((0, rows - real), (0, 0)))
            r_local = np.full(side, rows, np.int32)  # out-of-range -> dropped
            c_local = np.zeros(side, np.int32)
            r_local[: i1 - i0] = n_rows[i0:i1] - start
            c_local[: i1 - i0] = n_cols[i0:i1]
            yield start, real, p_chunk, r_local, c_local

    def _span_batches(self, span_codes: np.ndarray, rows: int):
        n = span_codes.shape[0]
        for start in range(0, n, rows):
            chunk = span_codes[start : start + rows]
            real = chunk.shape[0]
            if real != rows:
                chunk = np.pad(chunk, ((0, rows - real), (0, 0)))
            yield start, real, chunk

    def _row_chunk_plan(self, row_uidx: np.ndarray, n_u: int, rows: int):
        """Chunking for (variant, gene)-expanded rows whose nondecreasing
        ``row_uidx`` maps them onto chunks of ``rows`` unique variants:
        (chunk starts, per-chunk row bounds, r_pad). ``r_pad`` is one static
        64-row bucket across all chunks so every call compiles the same
        kernel signature. Shared by the sub (packed_rows) and indel
        (pair_rows) serving paths — the bucket arithmetic must never
        diverge between them."""
        starts = list(range(0, n_u, rows))
        r_bounds = [
            (int(np.searchsorted(row_uidx, s)), int(np.searchsorted(row_uidx, min(s + rows, n_u))))
            for s in starts
        ]
        max_r = max((b - a for a, b in r_bounds), default=1)
        r_pad = -(-max(max_r, 1) // 64) * 64
        return starts, r_bounds, r_pad

    def _span_rows(self, n_offsets: int) -> int:
        rows = max(self.batch_size // n_offsets, 1)
        n_dev = self.mesh.devices.size
        while rows % n_dev:
            rows += 1
        return rows

    def _pair_rows(self, n_offsets: int) -> int:
        """Pairs per call for the two-span kernels: each pair is TWO spans,
        so halve the single-span row count — keeping the per-call device
        batch (2*pairs spans) equal to the single-span paths'. Measured on
        the chip: full-size pair chunks ran ~20-50% slower end to end
        (doubled programs pipeline worse through the relay and the padded
        tail chunk wastes 2x the work)."""
        rows = self._span_rows(n_offsets)
        pairs = max(rows // 2, 1)
        # pairs itself must divide the mesh: the unpacked fallback ships ref
        # and alt as SEPARATE (pairs, L) batch-sharded arrays
        n_dev = self.mesh.devices.size
        while pairs % n_dev:
            pairs += 1
        return pairs

    def predict_span_codes(self, span_codes: np.ndarray, offsets, *, rc_mode: str = "none") -> np.ndarray:
        """Span-amortized forward: (N, span_len) int8 codes -> per-window
        predictions for windows span[o : o+2000] at each offset.

        rc_mode: 'none' -> (N, O, 2002); 'average' -> fwd/RC averaged
        (N, O, 2002); 'concat' -> (N, 2, O, 2002) with fwd at [:,0], RC at
        [:,1].
        """
        span_codes = np.asarray(span_codes, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        n = span_codes.shape[0]
        span_len = span_codes.shape[1]
        rows = self._span_rows(len(offsets))
        shape = (n, 2, len(offsets), 2002) if rc_mode == "concat" else (n, len(offsets), 2002)
        out = np.empty(shape, dtype=self.out_dtype)
        plan = self._pack2_plan(span_codes, rows)

        def jobs():
            if plan is not None:
                for start, real, p_chunk, r_local, c_local in self._pack2_chunks(plan, rows, n):
                    dev = jax.device_put(p_chunk, self._batch_sharding)
                    yield start, real, self._forward_spans_packed2(
                        self.params, dev, jnp.asarray(r_local), jnp.asarray(c_local),
                        offsets, rc_mode, span_len,
                    )
            else:
                for start, real, chunk in self._span_batches(span_codes, rows):
                    dev = jax.device_put(chunk, self._batch_sharding)
                    yield start, real, self._forward_spans(self.params, dev, offsets, rc_mode)

        self._run_pipelined(jobs(), lambda s, r, y: out.__setitem__(slice(s, s + r), np.asarray(y)[:r]))
        return out

    def predict_spans_project(self, span_codes: np.ndarray, offsets, pos_weights: np.ndarray) -> np.ndarray:
        """Gene path fully fused: spans -> shared-conv windows -> fwd/RC
        average -> decay projection, all on device. (N, span_len) ->
        (N, n_basis*2002) float32 features."""
        span_codes = np.asarray(span_codes, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        pw = jnp.asarray(pos_weights)
        n = span_codes.shape[0]
        span_len = span_codes.shape[1]
        rows = self._span_rows(len(offsets))
        out = np.empty((n, pos_weights.shape[0] * 2002), dtype=np.float32)
        plan = self._pack2_plan(span_codes, rows)

        def jobs():
            if plan is not None:
                for start, real, p_chunk, r_local, c_local in self._pack2_chunks(plan, rows, n):
                    dev = jax.device_put(p_chunk, self._batch_sharding)
                    yield start, real, self._forward_spans_project_packed2(
                        self.params, dev, jnp.asarray(r_local), jnp.asarray(c_local), pw, offsets, span_len
                    )
            else:
                for start, real, chunk in self._span_batches(span_codes, rows):
                    dev = jax.device_put(chunk, self._batch_sharding)
                    yield start, real, self._forward_spans_project(self.params, dev, pw, offsets)

        self._run_pipelined(jobs(), lambda s, r, f: out.__setitem__(slice(s, s + r), np.asarray(f)[:r]))
        return out

    def project_spans_backbone_patch(
        self,
        backbone_span: np.ndarray,
        sample_spans: np.ndarray,
        starts_f: np.ndarray,
        starts_r: np.ndarray,
        offsets,
        pos_weights: np.ndarray,
        *,
        sub_len: int = PATCH_SUB_LEN,
    ) -> np.ndarray:
        """Cohort gene-path projection with backbone conv6 patching: the full
        conv stack runs ONCE on the shared backbone span (both orientations);
        each sample then recomputes only the conv6 frames around its own
        diff ranges before the dense layers + on-device decay projection.
        For a personal-genome cohort at ~40 private sites/sample this cuts
        the per-sample conv FLOPs ~3x vs :meth:`predict_spans_project`
        (which the features-only consensus path otherwise uses).

        Args:
            backbone_span: (span_len,) int8 codes of the shared backbone.
            sample_spans: (N, span_len) int8 codes.
            starts_f / starts_r: (N, K, 2) int32 ``(w0, d0)`` range starts
                for the forward / reverse-complement orientation
                (host-planned via ops.spans.conv6_patch_sites_plan on the
                forward and mirrored diff positions); inactive slots hold
                0 — a superfluous patch recomputes frames from the sample's
                own span and is exact by construction.
            pos_weights: (B, S) decay basis over the offsets.

        Returns (N, B*2002) float32 fwd/RC-averaged projected features,
        matching ``predict_spans_project(sample_spans, offsets, pos_weights)``
        up to fp reduction order.
        """
        backbone_span = np.asarray(backbone_span, dtype=np.int8)
        sample_spans = np.asarray(sample_spans, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        n, span_len = sample_spans.shape
        k_in = max(np.asarray(starts_f).shape[1], np.asarray(starts_r).shape[1], 1)
        # static K buckets in steps of 8: one program per bucket; finer than
        # pow2 because an inactive slot still convolves real bases (a pow2
        # bucket would waste up to half the patch compute)
        k_pad = -(-k_in // 8) * 8

        def pad_k(s):
            s = np.asarray(s, dtype=np.int32)
            if s.shape[1] != k_pad:
                s = np.pad(s, ((0, 0), (0, k_pad - s.shape[1]), (0, 0)))
            return s

        starts_f = pad_k(starts_f)
        starts_r = pad_k(starts_r)
        pw = jnp.asarray(pos_weights)
        rows = self._span_rows(len(offsets))
        out = np.empty((n, pos_weights.shape[0] * 2002), dtype=np.float32)
        ph_f, ph_r = self._backbone_phases(self.params, jnp.asarray(backbone_span[None]), offsets)

        def jobs():
            for start in range(0, n, rows):
                real = min(start + rows, n) - start
                pad = rows - real
                chunk = np.pad(sample_spans[start : start + real], ((0, pad), (0, 0)))
                sf = np.pad(starts_f[start : start + real], ((0, pad), (0, 0), (0, 0)))
                sr = np.pad(starts_r[start : start + real], ((0, pad), (0, 0), (0, 0)))
                yield start, real, self._forward_spans_project_patch(
                    self.params,
                    ph_f,
                    ph_r,
                    jax.device_put(chunk, self._batch_sharding),
                    jax.device_put(sf, self._batch_sharding),
                    jax.device_put(sr, self._batch_sharding),
                    pw,
                    offsets,
                    sub_len,
                )

        self._run_pipelined(jobs(), lambda s, r, f: out.__setitem__(slice(s, s + r), np.asarray(f)[:r]))
        return out

    def predict_span_pairs_diff(
        self, ref_spans: np.ndarray, alt_spans: np.ndarray, offsets, *, sink=None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """h5-contract pair forward: (N, span_len) ref/alt spans ->
        (ref, alt, diff), each (2N, n_offsets, 2002) float32 in the
        reference h5 ROW LAYOUT — rows [0:N] forward, [N:2N] reverse
        complement (expecto_utils.py:36-38) — so the per-shift h5 arrays are
        zero-copy slices ``x[:, si]`` (no 2N-row concat per shift).

        ``diff = alt - ref`` is computed in fp32 on device and fetched at the
        runner's wire dtype, so production (fp16-fetch) mode keeps diff's
        relative precision — the host reconstructs ``alt = ref + diff`` in
        fp32. Spans ship 2-bit packed, interleaved per variant, like the
        fused serving pair kernel.

        ``sink(start, real, ref, alt, diff)`` streams chunks instead of
        materializing the 3x(2N, S, M) arrays (~43 GB at the reference's
        default 1e5-variant chunk size): each call delivers fp32 arrays of
        shape (real, 2[fwd|rc], S, M) for variant rows [start, start+real)
        and the method returns None. Sink calls come from the fetch worker
        threads, possibly out of order but never concurrently for the same
        rows; a sink that serializes (e.g. h5 writes under a lock) must do
        its own locking."""
        ref_spans = np.asarray(ref_spans, dtype=np.int8)
        alt_spans = np.asarray(alt_spans, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        n, span_len = ref_spans.shape
        rows = self._pair_rows(len(offsets))
        if sink is None:
            shape = (2 * n, len(offsets), 2002)
            REF = np.empty(shape, dtype=np.float32)
            ALT = np.empty(shape, dtype=np.float32)
            DIFF = np.empty(shape, dtype=np.float32)

        inter = np.empty((2 * n, span_len), dtype=np.int8)
        inter[0::2] = ref_spans
        inter[1::2] = alt_spans
        plan = self._pack2_plan(inter, 2 * rows)

        def jobs():
            if plan is not None:
                for start2, real2, p_chunk, r_local, c_local in self._pack2_chunks(plan, 2 * rows, 2 * n):
                    yield start2 // 2, real2 // 2, self._forward_spans_pair_diff_packed2(
                        self.params,
                        jax.device_put(p_chunk, self._batch_sharding),
                        jnp.asarray(r_local),
                        jnp.asarray(c_local),
                        offsets,
                        span_len,
                    )
            else:
                for start in range(0, n, rows):
                    real = min(start + rows, n) - start
                    pad = rows - real
                    r_chunk = np.pad(ref_spans[start : start + real], ((0, pad), (0, 0)))
                    a_chunk = np.pad(alt_spans[start : start + real], ((0, pad), (0, 0)))
                    yield start, real, self._forward_spans_pair_diff(
                        self.params,
                        jax.device_put(r_chunk, self._batch_sharding),
                        jax.device_put(a_chunk, self._batch_sharding),
                        offsets,
                    )

        def write(s, r, stacked):
            y = np.asarray(stacked)[:r]  # (r, 2[ref|diff], 2[fwd|rc], S, M) wire dtype
            if sink is not None:
                ref = y[:, 0].astype(np.float32)   # (r, 2, S, M)
                diff = y[:, 1].astype(np.float32)
                sink(s, r, ref, ref + diff, diff)
                return
            for orient, s0 in ((0, s), (1, n + s)):  # fwd rows, then rc rows
                ref = REF[s0 : s0 + r]
                diff = DIFF[s0 : s0 + r]
                ref[...] = y[:, 0, orient]   # fp16 -> fp32 converts in place
                diff[...] = y[:, 1, orient]
                np.add(ref, diff, out=ALT[s0 : s0 + r])

        self._run_pipelined(jobs(), write)
        if sink is not None:
            return None
        return REF, ALT, DIFF

    def predict_span_pair_diffs_only(
        self, ref_spans: np.ndarray, alt_spans: np.ndarray, offsets, *, sink=None
    ) -> np.ndarray | None:
        """Legacy-contract pair forward: only ``diff = alt - ref`` leaves
        the device — HALF the wire of :meth:`predict_span_pairs_diff` on
        this fetch-bound path, for consumers of the original-ExPecto h5
        format whose single ``pred`` dataset is the diff
        (example/*.diff.h5; predict.py's diff-feature scoring path).

        Returns (2N, n_offsets, 2002) float32 in the reference [fwd; rc]
        row layout, or streams ``sink(start, real, diff)`` chunks of shape
        (real, 2[fwd|rc], S, M) fp32 and returns None (same sink threading
        rules as predict_span_pairs_diff)."""
        ref_spans = np.asarray(ref_spans, dtype=np.int8)
        alt_spans = np.asarray(alt_spans, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        n, span_len = ref_spans.shape
        rows = self._pair_rows(len(offsets))
        if sink is None:
            DIFF = np.empty((2 * n, len(offsets), 2002), dtype=np.float32)

        inter = np.empty((2 * n, span_len), dtype=np.int8)
        inter[0::2] = ref_spans
        inter[1::2] = alt_spans
        plan = self._pack2_plan(inter, 2 * rows)

        def jobs():
            if plan is not None:
                for start2, real2, p_chunk, r_local, c_local in self._pack2_chunks(plan, 2 * rows, 2 * n):
                    yield start2 // 2, real2 // 2, self._forward_spans_diff_only_packed2(
                        self.params,
                        jax.device_put(p_chunk, self._batch_sharding),
                        jnp.asarray(r_local),
                        jnp.asarray(c_local),
                        offsets,
                        span_len,
                    )
            else:
                for start in range(0, n, rows):
                    real = min(start + rows, n) - start
                    pad = rows - real
                    r_chunk = np.pad(ref_spans[start : start + real], ((0, pad), (0, 0)))
                    a_chunk = np.pad(alt_spans[start : start + real], ((0, pad), (0, 0)))
                    yield start, real, self._forward_spans_diff_only(
                        self.params,
                        jax.device_put(r_chunk, self._batch_sharding),
                        jax.device_put(a_chunk, self._batch_sharding),
                        offsets,
                    )

        def write(s, r, stacked):
            y = np.asarray(stacked)[:r]  # (r, 2[fwd|rc], S, M) wire dtype
            if sink is not None:
                sink(s, r, y.astype(np.float32))
                return
            for orient, s0 in ((0, s), (1, n + s)):
                DIFF[s0 : s0 + r] = y[:, orient]

        self._run_pipelined(jobs(), write)
        return None if sink is not None else DIFF

    def score_variant_spans(
        self,
        ref_spans: np.ndarray,
        alt_spans: np.ndarray,
        offsets,
        basis: np.ndarray,
        W: np.ndarray,
        bias: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fused SED serving: (N, span_len) ref/alt spans + (S, N, B) decay
        basis + stacked model weights (F, K) -> (REF, ALT, SED), each (N, K);
        SED carries the device-computed ALT - REF exactly (fp32 before the
        fetch cast), so small effects never suffer host-side cancellation.
        Only per-model scalars leave the device (~3 KB/variant for the full
        218-tissue modellist vs ~144 KB of track outputs).

        Both spans ship 2-bit packed (interleaved per variant) when the
        batch's N density fits the sparse sideband — 4x less host->device
        wire; pathologically N-dense batches fall back to unpacked int8."""
        ref_spans = np.asarray(ref_spans, dtype=np.int8)
        alt_spans = np.asarray(alt_spans, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        n, span_len = ref_spans.shape
        k = W.shape[1]
        rows = self._pair_rows(len(offsets))
        W_dev = jnp.asarray(W, dtype=jnp.float32)
        bias_dev = jnp.asarray(bias, dtype=jnp.float32)
        REF = np.empty((n, k), dtype=np.float32)
        ALT = np.empty((n, k), dtype=np.float32)
        SED = np.empty((n, k), dtype=np.float32)
        basis_wire = basis.astype(self._basis_wire_dtype, copy=False)

        inter = np.empty((2 * n, span_len), dtype=np.int8)
        inter[0::2] = ref_spans
        inter[1::2] = alt_spans
        plan = self._pack2_plan(inter, 2 * rows)

        def _basis_chunk(start, real):
            return np.pad(basis_wire[:, start : start + real], ((0, 0), (0, rows - real), (0, 0)))

        def jobs():
            if plan is not None:
                for start2, real2, p_chunk, r_local, c_local in self._pack2_chunks(plan, 2 * rows, 2 * n):
                    start, real = start2 // 2, real2 // 2
                    yield start, real, self._score_spans_pair_packed2(
                        self.params,
                        jax.device_put(p_chunk, self._batch_sharding),
                        jnp.asarray(r_local),
                        jnp.asarray(c_local),
                        jnp.asarray(_basis_chunk(start, real)),
                        W_dev,
                        bias_dev,
                        offsets,
                        span_len,
                    )
            else:
                for start in range(0, n, rows):
                    end = min(start + rows, n)
                    real = end - start
                    pad = rows - real
                    r_chunk = np.pad(ref_spans[start:end], ((0, pad), (0, 0)))
                    a_chunk = np.pad(alt_spans[start:end], ((0, pad), (0, 0)))
                    yield start, real, self._score_spans(
                        self.params,
                        jax.device_put(r_chunk, self._batch_sharding),
                        jax.device_put(a_chunk, self._batch_sharding),
                        jnp.asarray(_basis_chunk(start, real)),
                        W_dev,
                        bias_dev,
                        offsets,
                    )

        self._run_pipelined(jobs(), self._write_ref_sed(REF, ALT, SED))
        return REF, ALT, SED

    def score_variant_spans_packed(
        self,
        ref_spans: np.ndarray,
        mutpos: int,
        alt_alleles: np.ndarray,
        offsets,
        basis: np.ndarray,
        W: np.ndarray,
        bias: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Transfer-optimized fused serving: ships one 2-bit-packed span per
        variant (N bases in a sparse sideband) plus (N, A) alt-allele codes;
        the alt span is spliced on device at ``mutpos``. ~8x less
        host->device traffic than :meth:`score_variant_spans`. Falls back to
        4-bit packing when the batch is pathologically N-dense."""
        ref_spans = np.asarray(ref_spans, dtype=np.int8)
        alt_alleles = np.asarray(alt_alleles, dtype=np.int8)
        offsets = tuple(int(o) for o in offsets)
        n, span_len = ref_spans.shape
        k = W.shape[1]
        rows = self._span_rows(len(offsets))
        W_dev = jnp.asarray(W, dtype=jnp.float32)
        bias_dev = jnp.asarray(bias, dtype=jnp.float32)
        REF = np.empty((n, k), dtype=np.float32)
        ALT = np.empty((n, k), dtype=np.float32)
        SED = np.empty((n, k), dtype=np.float32)

        plan = self._pack2_plan(ref_spans, rows)
        packed_all = None if plan is not None else pack_codes(ref_spans)

        basis_wire = basis.astype(self._basis_wire_dtype, copy=False)

        def _aux(start, real):
            pad = rows - real
            a_chunk = np.pad(alt_alleles[start : start + real], ((0, pad), (0, 0)), constant_values=-1)
            b_chunk = np.pad(basis_wire[:, start : start + real], ((0, 0), (0, pad), (0, 0)))
            return a_chunk, (jnp.asarray(b_chunk), W_dev, bias_dev, offsets, span_len, int(mutpos))

        def jobs():
            if plan is not None:
                for start, real, p_chunk, r_local, c_local in self._pack2_chunks(plan, rows, n):
                    a_chunk, common = _aux(start, real)
                    yield start, real, self._score_spans_packed2(
                        self.params,
                        jax.device_put(p_chunk, self._batch_sharding),
                        jnp.asarray(r_local),
                        jnp.asarray(c_local),
                        jax.device_put(a_chunk, self._batch_sharding),
                        *common,
                    )
            else:
                for start in range(0, n, rows):
                    real = min(start + rows, n) - start
                    a_chunk, common = _aux(start, real)
                    p_chunk = np.pad(packed_all[start : start + real], ((0, rows - real), (0, 0)))
                    yield start, real, self._score_spans_packed(
                        self.params,
                        jax.device_put(p_chunk, self._batch_sharding),
                        jax.device_put(a_chunk, self._batch_sharding),
                        *common,
                    )

        self._run_pipelined(jobs(), self._write_ref_sed(REF, ALT, SED))
        return REF, ALT, SED

    def score_variant_spans_packed_rows(
        self,
        ref_spans_u: np.ndarray,
        mutpos: int,
        alt_alleles_u: np.ndarray,
        offsets,
        basis_rows: np.ndarray,
        row_uidx: np.ndarray,
        W: np.ndarray,
        bias: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fused serving over (variant, gene) rows that share variants: the
        conv/fc stack runs once per UNIQUE span; each row scores its own
        decay basis against an on-device gather of its variant's tracks.

        ``basis_rows``: (S, R, B); ``row_uidx``: (R,) nondecreasing index
        into the unique spans (rows of one variant must be contiguous — the
        closest-genes expansion produces exactly that layout).
        """
        ref_spans_u = np.asarray(ref_spans_u, dtype=np.int8)
        alt_alleles_u = np.asarray(alt_alleles_u, dtype=np.int8)
        row_uidx = np.asarray(row_uidx, dtype=np.int64)
        offsets = tuple(int(o) for o in offsets)
        n_u, span_len = ref_spans_u.shape
        n_rows_total = row_uidx.shape[0]
        k = W.shape[1]
        rows = self._span_rows(len(offsets))
        plan = self._pack2_plan(ref_spans_u, rows)
        if plan is None:
            # pathologically N-dense: expand and take the per-row kernel
            return self.score_variant_spans_packed(
                ref_spans_u[row_uidx], mutpos, alt_alleles_u[row_uidx], offsets, basis_rows, W, bias
            )
        W_dev = jnp.asarray(W, dtype=jnp.float32)
        bias_dev = jnp.asarray(bias, dtype=jnp.float32)
        REF = np.empty((n_rows_total, k), dtype=np.float32)
        ALT = np.empty((n_rows_total, k), dtype=np.float32)
        SED = np.empty((n_rows_total, k), dtype=np.float32)

        basis_wire = basis_rows.astype(self._basis_wire_dtype, copy=False)
        starts, r_bounds, r_pad = self._row_chunk_plan(row_uidx, n_u, rows)

        def jobs():
            for (start, (r0, r1)), (s0, real_u, p_chunk, rl, cl) in zip(
                zip(starts, r_bounds), self._pack2_chunks(plan, rows, n_u)
            ):
                real_r = r1 - r0
                a_chunk = np.pad(
                    alt_alleles_u[start : start + real_u], ((0, rows - real_u), (0, 0)), constant_values=-1
                )
                b_chunk = np.pad(
                    basis_wire[:, r0:r1], ((0, 0), (0, r_pad - real_r), (0, 0))
                )
                idx_local = np.zeros(r_pad, np.int32)
                idx_local[:real_r] = (row_uidx[r0:r1] - start).astype(np.int32)
                yield (r0, real_r), real_r, self._score_spans_packed2_rows(
                    self.params,
                    jax.device_put(p_chunk, self._batch_sharding),
                    jnp.asarray(rl),
                    jnp.asarray(cl),
                    jax.device_put(a_chunk, self._batch_sharding),
                    jnp.asarray(b_chunk),
                    jnp.asarray(idx_local),
                    W_dev,
                    bias_dev,
                    offsets,
                    span_len,
                    int(mutpos),
                )

        self._run_pipelined(jobs(), self._write_ref_sed(REF, ALT, SED))
        return REF, ALT, SED

    def score_variant_span_pairs_rows(
        self,
        ref_spans_u: np.ndarray,
        alt_spans_u: np.ndarray,
        offsets,
        basis_rows: np.ndarray,
        row_uidx: np.ndarray,
        W: np.ndarray,
        bias: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pair serving (indels) over (variant, gene) rows sharing variants:
        both conv stacks run once per UNIQUE (ref, alt) span pair; each row
        scores its own decay basis against an on-device gather of its
        variant's tracks. Spans ship 2-bit packed, interleaved per pair.

        ``basis_rows``: (S, R, B); ``row_uidx``: (R,) nondecreasing index
        into the unique pairs (the closest-genes expansion's layout).
        """
        ref_spans_u = np.asarray(ref_spans_u, dtype=np.int8)
        alt_spans_u = np.asarray(alt_spans_u, dtype=np.int8)
        row_uidx = np.asarray(row_uidx, dtype=np.int64)
        offsets = tuple(int(o) for o in offsets)
        n_u, span_len = ref_spans_u.shape
        n_rows_total = row_uidx.shape[0]
        k = W.shape[1]
        rows = self._pair_rows(len(offsets))

        inter = np.empty((2 * n_u, span_len), dtype=np.int8)
        inter[0::2] = ref_spans_u
        inter[1::2] = alt_spans_u
        plan = self._pack2_plan(inter, 2 * rows)
        if plan is None:
            # pathologically N-dense: expand and take the per-row pair kernel
            return self.score_variant_spans(
                ref_spans_u[row_uidx], alt_spans_u[row_uidx], offsets, basis_rows, W, bias
            )
        W_dev = jnp.asarray(W, dtype=jnp.float32)
        bias_dev = jnp.asarray(bias, dtype=jnp.float32)
        REF = np.empty((n_rows_total, k), dtype=np.float32)
        ALT = np.empty((n_rows_total, k), dtype=np.float32)
        SED = np.empty((n_rows_total, k), dtype=np.float32)

        basis_wire = basis_rows.astype(self._basis_wire_dtype, copy=False)
        starts, r_bounds, r_pad = self._row_chunk_plan(row_uidx, n_u, rows)

        def jobs():
            for (start, (r0, r1)), (_s2, _real2, p_chunk, rl, cl) in zip(
                zip(starts, r_bounds), self._pack2_chunks(plan, 2 * rows, 2 * n_u)
            ):
                real_r = r1 - r0
                b_chunk = np.pad(basis_wire[:, r0:r1], ((0, 0), (0, r_pad - real_r), (0, 0)))
                idx_local = np.zeros(r_pad, np.int32)
                idx_local[:real_r] = (row_uidx[r0:r1] - start).astype(np.int32)
                yield (r0, real_r), real_r, self._score_spans_pair_packed2_rows(
                    self.params,
                    jax.device_put(p_chunk, self._batch_sharding),
                    jnp.asarray(rl),
                    jnp.asarray(cl),
                    jnp.asarray(b_chunk),
                    jnp.asarray(idx_local),
                    W_dev,
                    bias_dev,
                    offsets,
                    span_len,
                )

        self._run_pipelined(jobs(), self._write_ref_sed(REF, ALT, SED))
        return REF, ALT, SED

    def predict_codes_fwd_rc_concat(self, codes: np.ndarray) -> np.ndarray:
        """Reference-layout output: rows [0:N] forward, [N:2N] reverse
        complement (the encodeSeqs concat order, expecto_utils.py:36-38)."""
        from ..genome.encode import reverse_complement_codes

        both = np.concatenate([codes, reverse_complement_codes(codes)], axis=0)
        return self.predict_codes(both)

    def predict_and_project(
        self, codes: np.ndarray, pos_weights: np.ndarray, n_shifts: int
    ) -> np.ndarray:
        """Gene path fused on device: (G*S, 2000) codes + (B, S) decay
        weights -> (G, B*2002) features with fwd/RC averaging
        (compute_expecto_features.py:115-124 collapsed into one jit). Ships
        20x less data off-device than fetching raw predictions."""
        codes = np.asarray(codes, dtype=np.int8)
        if codes.shape[0] % n_shifts != 0:
            raise ValueError("codes rows must be a multiple of n_shifts")
        pw = jnp.asarray(pos_weights)
        genes_per_batch = max(self.batch_size // n_shifts, 1)
        n_dev = self.mesh.devices.size
        while (genes_per_batch * n_shifts) % n_dev:
            genes_per_batch += 1
        rows = genes_per_batch * n_shifts
        n_genes = codes.shape[0] // n_shifts
        out = np.empty((n_genes, pos_weights.shape[0] * 2002), dtype=np.float32)

        def jobs():
            for g0 in range(0, n_genes, genes_per_batch):
                g1 = min(g0 + genes_per_batch, n_genes)
                chunk = codes[g0 * n_shifts : g1 * n_shifts]
                if chunk.shape[0] != rows:
                    chunk = np.pad(chunk, ((0, rows - chunk.shape[0]), (0, 0)))
                dev = jax.device_put(chunk, self._batch_sharding)
                yield g0, g1 - g0, self._forward_project(self.params, dev, pw, n_shifts)

        self._run_pipelined(jobs(), lambda s, r, f: out.__setitem__(slice(s, s + r), np.asarray(f)[:r]))
        return out
