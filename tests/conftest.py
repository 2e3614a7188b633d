"""Test harness: force an 8-device virtual CPU mesh so sharding/collective
paths are exercised without TPU hardware (SURVEY §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax

# the axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; pin the config explicitly so tests run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the fp32 Beluga graphs dominate suite runtime on
# repeat runs; cache compilations across pytest invocations.
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).parent / ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_genome(tmp_path_factory):
    """A small deterministic FASTA with two contigs, indexed."""
    from expecto_tpu.genome.fasta import FastaIndex, write_fasta

    rs = np.random.RandomState(1234)
    bases = np.array(list("ACGT"))
    contigs = {
        "chr1": "".join(bases[rs.randint(0, 4, 60000)]),
        "chr2": "".join(bases[rs.randint(0, 4, 45000)]),
    }
    path = tmp_path_factory.mktemp("genome") / "tiny.fa"
    write_fasta(path, contigs)
    return FastaIndex(path), contigs
