"""Runner upgrades: fused on-device projection, fp16 output, pipelining."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from expecto_tpu.models.convert import state_dict_to_params
from expecto_tpu.ops.decay import gene_pos_weights, project_features
from expecto_tpu.parallel.runner import BelugaRunner
from torch_oracle import TorchBeluga


@pytest.fixture(scope="module")
def params():
    torch.manual_seed(5)
    net = TorchBeluga().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(0.05)
    return state_dict_to_params(net.state_dict_reference_keys())


def test_predict_and_project_matches_host_projection(params):
    n_shifts, n_genes = 4, 3
    shifts = [-400, -200, 0, 200]
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(n_genes * n_shifts, 2000), dtype=np.int8)
    runner = BelugaRunner(params, batch_size=8)

    pos_weights = gene_pos_weights(shifts)
    fused = runner.predict_and_project(codes, pos_weights, n_shifts)

    preds = runner.predict_codes(codes, average_rc=True).reshape(n_genes, n_shifts, -1)
    want = np.stack([project_features(pos_weights, preds[g][:, None, :])[0] for g in range(n_genes)])
    np.testing.assert_allclose(fused, want, rtol=1e-4, atol=1e-6)


def test_fp16_output_close_to_fp32(params):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, size=(5, 2000), dtype=np.int8)
    r32 = BelugaRunner(params, batch_size=8)
    r16 = BelugaRunner(params, batch_size=8, out_dtype=np.float16)
    y32 = r32.predict_codes(codes)
    y16 = r16.predict_codes(codes)
    assert y16.dtype == np.float16
    np.testing.assert_allclose(y16, y32, atol=5e-4)


def test_predict_codes_out_dtype_override(params):
    """A production (fp16-fetch) runner forced to an fp32 wire must return
    the fp32 runner's values exactly — the serving window fallback relies on
    this to difference ALT - REF on host without fp16 rounding (ADVICE r3)."""
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 5, size=(5, 2000), dtype=np.int8)
    r32 = BelugaRunner(params, batch_size=8)
    r16 = BelugaRunner(params, batch_size=8, out_dtype=np.float16)
    forced = r16.predict_codes(codes, out_dtype=np.float32)
    assert forced.dtype == np.float32
    np.testing.assert_array_equal(forced, r32.predict_codes(codes))


def test_pipelining_preserves_order(params):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 5, size=(23, 2000), dtype=np.int8)
    deep = BelugaRunner(params, batch_size=4, pipeline_depth=5)
    shallow = BelugaRunner(params, batch_size=4, pipeline_depth=1)
    np.testing.assert_allclose(deep.predict_codes(codes), shallow.predict_codes(codes), atol=1e-6)


def test_projection_batch_spill(params):
    """More genes than fit one device batch: results must be identical."""
    n_shifts = 4
    shifts = [-400, -200, 0, 200]
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, size=(6 * n_shifts, 2000), dtype=np.int8)
    pos_weights = gene_pos_weights(shifts)
    small = BelugaRunner(params, batch_size=8)  # 2 genes/batch
    big = BelugaRunner(params, batch_size=64)
    np.testing.assert_allclose(
        small.predict_and_project(codes, pos_weights, n_shifts),
        big.predict_and_project(codes, pos_weights, n_shifts),
        rtol=1e-4, atol=1e-6,
    )


def test_packed_codes_roundtrip():
    from expecto_tpu.parallel.runner import pack_codes, unpack_codes
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(3, 101), dtype=np.int8)
    packed = pack_codes(codes)
    assert packed.shape == (3, 51)
    out = np.asarray(unpack_codes(jnp.asarray(packed), 101))
    np.testing.assert_array_equal(out, codes)


def test_score_spans_packed_matches_unpacked(params):
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.ops.decay import variant_basis
    from expecto_tpu.genome.windows import variant_shifts

    maxshift = 400
    shifts = variant_shifts(maxshift)
    offsets = tuple(s + maxshift for s in shifts)
    span_len = 2 * maxshift + 2000
    mutpos = maxshift + 999
    rng = np.random.default_rng(7)
    n = 3
    ref_spans = rng.integers(0, 4, size=(n, span_len), dtype=np.int8)
    alt_alleles = ((ref_spans[:, mutpos] + 1) % 4).astype(np.int8)[:, None]
    alt_spans = ref_spans.copy()
    alt_spans[:, mutpos] = alt_alleles[:, 0]

    basis = variant_basis(rng.integers(-5000, 5000, n), rng.choice(["+", "-"], n), shifts).astype(np.float32)
    W = rng.standard_normal((20020, 4)).astype(np.float32) * 0.01
    bias = rng.standard_normal(4).astype(np.float32)

    runner = BelugaRunner(params, batch_size=64)
    REF1, ALT1, _SED1 = runner.score_variant_spans(ref_spans, alt_spans, offsets, basis, W, bias)
    REF2, ALT2, _SED2 = runner.score_variant_spans_packed(ref_spans, mutpos, alt_alleles, offsets, basis, W, bias)
    np.testing.assert_allclose(REF2, REF1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ALT2, ALT1, rtol=1e-5, atol=1e-5)


def test_packed2_codes_roundtrip():
    from expecto_tpu.parallel.runner import pack_codes2, unpack_codes2
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(3, 103), dtype=np.int8)
    codes[0, 5] = 4
    codes[2, 100] = 4
    packed, rows, cols = pack_codes2(codes)
    assert packed.shape == (3, 26)  # 2 bits/base
    assert len(rows) == 2
    out = np.asarray(unpack_codes2(jnp.asarray(packed), 103, jnp.asarray(rows), jnp.asarray(cols)))
    np.testing.assert_array_equal(out, codes)
    # padded out-of-range sideband entries are dropped
    rows_p = np.concatenate([rows, [codes.shape[0]]]).astype(np.int32)
    cols_p = np.concatenate([cols, [0]]).astype(np.int32)
    out = np.asarray(unpack_codes2(jnp.asarray(packed), 103, jnp.asarray(rows_p), jnp.asarray(cols_p)))
    np.testing.assert_array_equal(out, codes)


def test_score_spans_packed_with_ns_matches_unpacked(params):
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.ops.decay import variant_basis
    from expecto_tpu.genome.windows import variant_shifts

    maxshift = 400
    shifts = variant_shifts(maxshift)
    offsets = tuple(s + maxshift for s in shifts)
    span_len = 2 * maxshift + 2000
    mutpos = maxshift + 999
    rng = np.random.default_rng(8)
    n = 3
    ref_spans = rng.integers(0, 4, size=(n, span_len), dtype=np.int8)
    ref_spans[rng.random(ref_spans.shape) < 0.01] = 4  # sprinkle Ns
    ref_spans[:, mutpos] = rng.integers(0, 4, n)
    alt_alleles = ((ref_spans[:, mutpos] + 1) % 4).astype(np.int8)[:, None]
    alt_spans = ref_spans.copy()
    alt_spans[:, mutpos] = alt_alleles[:, 0]

    basis = variant_basis(rng.integers(-5000, 5000, n), rng.choice(["+", "-"], n), shifts).astype(np.float32)
    W = rng.standard_normal((20020, 4)).astype(np.float32) * 0.01
    bias = rng.standard_normal(4).astype(np.float32)

    runner = BelugaRunner(params, batch_size=64)
    REF1, ALT1, _SED1 = runner.score_variant_spans(ref_spans, alt_spans, offsets, basis, W, bias)
    REF2, ALT2, _SED2 = runner.score_variant_spans_packed(ref_spans, mutpos, alt_alleles, offsets, basis, W, bias)
    np.testing.assert_allclose(REF2, REF1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ALT2, ALT1, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_score_spans_packed_ndense_fallback(params):
    # pathologically N-dense batches exceed the sideband budget and take the
    # 4-bit fallback; results must be identical either way
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.ops.decay import variant_basis
    from expecto_tpu.genome.windows import variant_shifts

    maxshift = 400
    shifts = variant_shifts(maxshift)
    offsets = tuple(s + maxshift for s in shifts)
    span_len = 2 * maxshift + 2000
    mutpos = maxshift + 999
    rng = np.random.default_rng(9)
    n = 12
    ref_spans = rng.integers(0, 4, size=(n, span_len), dtype=np.int8)
    ref_spans[rng.random(ref_spans.shape) < 0.6] = 4  # ~20k Ns per chunk
    ref_spans[:, mutpos] = rng.integers(0, 4, n)
    alt_alleles = ((ref_spans[:, mutpos] + 1) % 4).astype(np.int8)[:, None]
    alt_spans = ref_spans.copy()
    alt_spans[:, mutpos] = alt_alleles[:, 0]

    basis = variant_basis(rng.integers(-5000, 5000, n), rng.choice(["+", "-"], n), shifts).astype(np.float32)
    W = rng.standard_normal((20020, 4)).astype(np.float32) * 0.01
    bias = rng.standard_normal(4).astype(np.float32)

    runner = BelugaRunner(params, batch_size=256)
    REF1, ALT1, _SED1 = runner.score_variant_spans(ref_spans, alt_spans, offsets, basis, W, bias)
    REF2, ALT2, _SED2 = runner.score_variant_spans_packed(ref_spans, mutpos, alt_alleles, offsets, basis, W, bias)
    np.testing.assert_allclose(REF2, REF1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ALT2, ALT1, rtol=1e-5, atol=1e-5)


def test_predict_span_codes_pack2_equals_fallback(params, monkeypatch):
    from expecto_tpu.parallel.runner import BelugaRunner

    rng = np.random.default_rng(10)
    spans = rng.integers(0, 4, size=(3, 2400), dtype=np.int8)
    spans[rng.random(spans.shape) < 0.02] = 4
    offsets = (0, 200, 400)

    runner = BelugaRunner(params, batch_size=64)
    got2 = runner.predict_span_codes(spans, offsets, rc_mode="average")
    monkeypatch.setattr(BelugaRunner, "PACK2_SIDE_BUDGET", -1)  # force raw fallback
    got_raw = runner.predict_span_codes(spans, offsets, rc_mode="average")
    np.testing.assert_allclose(got2, got_raw, rtol=1e-6, atol=1e-6)


def test_score_spans_pair_packed_equals_unpacked(params, monkeypatch):
    """The pair (indel) serving path ships both spans 2-bit packed
    interleaved; results must equal the unpacked pair fallback exactly
    (same kernel after unpack), Ns included."""
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.ops.decay import variant_basis
    from expecto_tpu.genome.windows import variant_shifts

    maxshift = 400
    shifts = variant_shifts(maxshift)
    offsets = tuple(s + maxshift for s in shifts)
    span_len = 2 * maxshift + 2000
    rng = np.random.default_rng(15)
    n = 5
    ref_spans = rng.integers(0, 4, size=(n, span_len), dtype=np.int8)
    ref_spans[rng.random(ref_spans.shape) < 0.01] = 4
    alt_spans = np.roll(ref_spans, 2, axis=1)  # crop-shifted alt (indel shape)

    basis = variant_basis(rng.integers(-5000, 5000, n), rng.choice(["+", "-"], n), shifts).astype(np.float32)
    W = rng.standard_normal((20020, 4)).astype(np.float32) * 0.01
    bias = rng.standard_normal(4).astype(np.float32)

    runner = BelugaRunner(params, batch_size=64)
    REFp, ALTp, SEDp = runner.score_variant_spans(ref_spans, alt_spans, offsets, basis, W, bias)
    monkeypatch.setattr(BelugaRunner, "PACK2_SIDE_BUDGET", -1)  # force unpacked fallback
    REFu, ALTu, SEDu = runner.score_variant_spans(ref_spans, alt_spans, offsets, basis, W, bias)
    np.testing.assert_allclose(REFp, REFu, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(ALTp, ALTu, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(SEDp, SEDu, rtol=1e-6, atol=1e-6)


def test_score_spans_packed_rows_matches_expanded(params):
    # variant-gene expanded serving: conv once per unique span + on-device
    # gather must equal running the per-row kernel on expanded inputs
    from expecto_tpu.parallel.runner import BelugaRunner
    from expecto_tpu.ops.decay import variant_basis
    from expecto_tpu.genome.windows import variant_shifts

    maxshift = 400
    shifts = variant_shifts(maxshift)
    offsets = tuple(s + maxshift for s in shifts)
    span_len = 2 * maxshift + 2000
    mutpos = maxshift + 999
    rng = np.random.default_rng(14)
    n_u = 3
    spans_u = rng.integers(0, 4, size=(n_u, span_len), dtype=np.int8)
    alt_u = ((spans_u[:, mutpos] + 1) % 4).astype(np.int8)[:, None]
    row_uidx = np.array([0, 0, 0, 1, 2, 2])  # 3/1/2 genes per variant
    R = len(row_uidx)
    basis = variant_basis(rng.integers(-5000, 5000, R), rng.choice(["+", "-"], R), shifts).astype(np.float32)
    W = rng.standard_normal((20020, 4)).astype(np.float32) * 0.01
    bias = rng.standard_normal(4).astype(np.float32)

    runner = BelugaRunner(params, batch_size=64)
    REF1, ALT1, _SED1 = runner.score_variant_spans_packed(
        spans_u[row_uidx], mutpos, alt_u[row_uidx], offsets, basis, W, bias
    )
    REF2, ALT2, _SED2 = runner.score_variant_spans_packed_rows(
        spans_u, mutpos, alt_u, offsets, basis, row_uidx, W, bias
    )
    np.testing.assert_allclose(REF2, REF1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ALT2, ALT1, rtol=1e-5, atol=1e-5)
