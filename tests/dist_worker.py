"""Spawned worker for the 2-process ``jax.distributed`` tests.

Launched by test_dist_e2e.py as ``python dist_worker.py <mode> <json>`` with
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` in
the environment (absent for the single-process baselines). The process group
is real: gloo CPU collectives, cross-process psum/allgather — the same
runtime path a TPU pod slice uses, minus the hardware.
"""

import json
import os
import sys


def main() -> int:
    mode = sys.argv[1]
    cfg = json.loads(sys.argv[2])

    # must precede first jax backend use (selects gloo + joins the group)
    from expecto_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    import numpy as np

    if mode == "chromatin":
        from expecto_tpu.cli.chromatin import main as chromatin_main

        return chromatin_main([
            cfg["vcf"],
            "--genome", cfg["genome"],
            "--beluga_weights", cfg["weights"],
            "--output_dir", cfg["out_dir"],
            "--maxshift", str(cfg["maxshift"]),
            "--batchsize", str(cfg["batchsize"]),
        ])

    if mode == "train":
        # real-shape distributed gblinear: every process regenerates the
        # deterministic dataset and trains on its host_row_range shard
        from expecto_tpu.models.gblinear import (
            GBLinearParams,
            train_gblinear,
            train_gblinear_sharded,
        )
        from expecto_tpu.parallel.dist import host_row_range, is_primary

        n, f = int(cfg["n"]), int(cfg["f"])
        rng = np.random.default_rng(int(cfg["seed"]))
        X = rng.normal(size=(n, f)).astype(np.float32)
        w_true = (np.sin(np.arange(f) / 7.0) * 0.05).astype(np.float32)
        y = (X @ w_true + 2.0).astype(np.float32)
        hp = GBLinearParams(num_round=int(cfg["num_round"]), block_size=int(cfg["block_size"]))
        # per-round eval watchlist: eval rows replicated on every host
        evals = [(X[:512], y[:512], "eval")] if cfg.get("evals") else None
        if cfg.get("baseline"):
            model = train_gblinear(X, y, hp, evals=evals)
        else:
            lo, hi = host_row_range(n)
            model = train_gblinear_sharded(X[lo:hi], y[lo:hi], hp, evals=evals)
        if is_primary():
            hist = {f"hist_{k}": np.asarray(v) for k, v in model.eval_history.items()}
            np.savez(cfg["out"], weight=model.weight, bias=np.float64(model.bias), **hist)
        return 0

    if mode == "features":
        from expecto_tpu.cli.compute_features import main as features_main

        return features_main([
            cfg["annoFile"],
            "--genome", cfg["genome"],
            "--beluga_weights", cfg["weights"],
            "--batchsize", str(cfg["batchsize"]),
            "-o", cfg["out_dir"],
        ])

    if mode == "score":
        from expecto_tpu.cli.score import main as score_main

        return score_main([
            cfg["vcf"],
            "--geneFile", cfg["geneFile"],
            "--model_save_file", cfg["model"],
            "--genome", cfg["genome"],
            "--beluga_weights", cfg["weights"],
            "--maxshift", str(cfg["maxshift"]),
            "--batchsize", str(cfg["batchsize"]),
            "--fp32",
            "--output", cfg["output"],
        ])

    if mode == "predict":
        from expecto_tpu.cli.predict import main as predict_main

        return predict_main([
            "--model_save_file", cfg["model"],
            "--coorFile", cfg["vcf"],
            "--geneFile", cfg["geneFile"],
            "--snpEffectFilePattern", cfg["pattern"],
            "--maxshift", str(cfg["maxshift"]),
            "-o", cfg["out_dir"],
        ])

    if mode == "consensus":
        from expecto_tpu.cli.consensus import main as consensus_main

        if cfg["cmd"] == "top-eqtls":
            args = ["top-eqtls", cfg["model"], cfg["consensus_dir"],
                    cfg["eqtls_df"], cfg["snps_vcf"], "--genes", cfg["genes"]]
        else:
            args = ["samples" if cfg["cmd"] == "samples" else "ref",
                    cfg["model"], cfg["consensus_dir"], cfg["genes_file"]]
        args += ["--beluga_weights", cfg["weights"],
                 "--batch_size", str(cfg["batchsize"]), "-o", cfg["out_dir"]]
        return consensus_main(args)

    if mode == "exchange2":
        # two back-to-back exchanges with the SAME tag into the same dir:
        # sequence-stamped shard names must keep call 2's writes clear of
        # the primary's deletion of call 1's shards (regression: tag reuse
        # raced the cleanup)
        from expecto_tpu.parallel.dist import exchange_row_blocks, host_row_range, is_primary

        n = int(cfg["n"])
        lo, hi = host_row_range(n)
        rows = np.arange(n, dtype=np.float64)
        m1 = exchange_row_blocks({"x": rows[lo:hi] * 2.0}, cfg["dir"], "reused_tag")
        m2 = exchange_row_blocks({"x": rows[lo:hi] * 3.0}, cfg["dir"], "reused_tag")
        assert np.array_equal(m1["x"], rows * 2.0), "first exchange corrupted"
        assert np.array_equal(m2["x"], rows * 3.0), "second exchange corrupted"
        if is_primary():
            np.savez(cfg["out"], x1=m1["x"], x2=m2["x"])
        return 0

    if mode == "train_cli":
        from expecto_tpu.cli.train import main as train_main

        args = [
            "--targetIndex", "1",
            "--expFile", cfg["expFile"],
            "--inputFile", cfg["inputFile"],
            "--annoFile", cfg["annoFile"],
            "--num_round", str(cfg["num_round"]),
            "--output_dir", cfg["out_dir"],
        ]
        if cfg.get("evalFile"):
            args += ["--evalFile", cfg["evalFile"]]
        return train_main(args)

    print(f"unknown worker mode {mode!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
