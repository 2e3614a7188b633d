"""Multi-host sharding helpers: deterministic ranges, sharded h5 merge."""

import h5py
import numpy as np
import pytest

from expecto_tpu.parallel.dist import (
    host_row_range,
    shard_path,
    list_shards,
    merge_sharded_h5,
    merge_sharded_npy,
    merge_sharded_csv,
    assemble_rows,
)


class TestRowRanges:
    def test_partition_covers_exactly(self):
        n, w = 103, 8
        ranges = [host_row_range(n, r, w) for r in range(w)]
        assert ranges[0][0] == 0 and ranges[-1][1] == n
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 == b0
        sizes = [b - a for a, b in ranges]
        assert max(sizes) - min(sizes) <= 1

    def test_single_host(self):
        assert host_row_range(10, 0, 1) == (0, 10)


class TestShardedH5:
    def test_shard_naming_and_merge(self, tmp_path):
        path = str(tmp_path / "out.h5")
        # single-host: name unchanged
        assert shard_path(path, 0, 1) == path

        n, w = 25, 3
        full = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
        ids = np.array([f"row{i}".encode() for i in range(n)])
        for r in range(w):
            a, b = host_row_range(n, r, w)
            with h5py.File(shard_path(path, r, w), "w") as f:
                f.create_dataset("data", data=full[a:b])
                f.create_dataset("ids", data=ids[a:b])

        assert len(list_shards(path)) == w
        merged = merge_sharded_h5(path, delete_shards=True)
        with h5py.File(merged) as f:
            np.testing.assert_array_equal(f["data"], full)
            np.testing.assert_array_equal(f["ids"], ids)
        assert list_shards(path) == [path]

    def test_fresh_shards_supersede_stale_merged_file(self, tmp_path):
        """A rerun into an output dir holding a previous run's merged file
        must merge the FRESH shards over it, not serve the stale file
        (ADVICE r2: list_shards used to early-return the merged path)."""
        path = str(tmp_path / "out.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("data", data=np.zeros((5, 4), np.float32))  # stale

        n, w = 10, 2
        full = np.arange(n * 4, dtype=np.float32).reshape(n, 4) + 1.0
        for r in range(w):
            a, b = host_row_range(n, r, w)
            with h5py.File(shard_path(path, r, w), "w") as f:
                f.create_dataset("data", data=full[a:b])

        assert len(list_shards(path)) == w  # shards win over the stale file
        merge_sharded_h5(path, delete_shards=True)
        with h5py.File(path) as f:
            np.testing.assert_array_equal(f["data"], full)
        assert list_shards(path) == [path]

    def test_missing_shard_raises(self, tmp_path):
        path = str(tmp_path / "x.h5")
        with h5py.File(shard_path(path, 0, 3), "w") as f:
            f.create_dataset("d", data=np.zeros(2))
        with pytest.raises(AssertionError, match="expected shards"):
            list_shards(path)

    def test_mixed_world_sizes_rejected(self, tmp_path):
        """Shards left behind by a run with a different host count must not
        be silently merged with a newer set (regression: a count-only check
        accepted 2-of-2 + 2-of-4 as four valid shards)."""
        path = str(tmp_path / "y.h5")
        for r, w in [(0, 2), (1, 2), (0, 4), (1, 4)]:
            with h5py.File(shard_path(path, r, w), "w") as f:
                f.create_dataset("d", data=np.zeros(1))
        with pytest.raises(AssertionError, match="mixed shard sets"):
            list_shards(path)

    def test_fold_merge_matches_single_host_layout(self, tmp_path):
        """The shift h5s stack [fwd; rc]; a fold=2 merge must reassemble
        [fwd_all; rc_all], not interleave per-shard halves."""
        n, w = 11, 3
        fwd = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
        rc = -fwd
        single = np.concatenate([fwd, rc], axis=0)  # the 1-host layout
        path = str(tmp_path / "shift.h5")
        for r in range(w):
            a, b = host_row_range(n, r, w)
            with h5py.File(shard_path(path, r, w), "w") as f:
                f.create_dataset("diff", data=np.concatenate([fwd[a:b], rc[a:b]], axis=0))
        merge_sharded_h5(path, fold_axis0=2, delete_shards=True)
        with h5py.File(path) as f:
            np.testing.assert_array_equal(f["diff"], single)

    def test_fold_merge_rejects_odd_rows(self, tmp_path):
        path = str(tmp_path / "odd.h5")
        for r in range(2):
            with h5py.File(shard_path(path, r, 2), "w") as f:
                f.create_dataset("d", data=np.zeros((3, 2)))
        with pytest.raises(AssertionError, match="not divisible by fold"):
            merge_sharded_h5(path, fold_axis0=2)

    def test_missing_dataset_in_one_shard_rejected(self, tmp_path):
        path = str(tmp_path / "md.h5")
        with h5py.File(shard_path(path, 0, 2), "w") as f:
            f.create_dataset("a", data=np.zeros((2, 2)))
            f.create_dataset("b", data=np.zeros((2, 2)))
        with h5py.File(shard_path(path, 1, 2), "w") as f:
            f.create_dataset("a", data=np.zeros((2, 2)))
        with pytest.raises(AssertionError, match="missing from some shards"):
            merge_sharded_h5(path)

    def test_dtype_mismatch_rejected(self, tmp_path):
        """One fp32 shard merged into fp16 shards would be silently cast by
        h5py on write — must raise instead."""
        path = str(tmp_path / "z.h5")
        for r, dt in [(0, np.float16), (1, np.float32)]:
            with h5py.File(shard_path(path, r, 2), "w") as f:
                f.create_dataset("d", data=np.zeros((2, 3), dt))
        with pytest.raises(AssertionError, match="dtype mismatch"):
            merge_sharded_h5(path)


def test_merge_sharded_npy(tmp_path):
    n, w = 10, 4
    full = np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
    path = str(tmp_path / "feats.npy")
    for r in range(w):
        a, b = host_row_range(n, r, w)
        np.save(shard_path(path, r, w), full[a:b])
    merge_sharded_npy(path, delete_shards=True)
    np.testing.assert_array_equal(np.load(path), full)
    assert list_shards(path) == [path]


def test_merge_sharded_csv(tmp_path):
    path = str(tmp_path / "preds.csv")
    rows = [f"g{i},{i * 1.5}\n" for i in range(7)]
    for r in range(3):
        a, b = host_row_range(7, r, 3)
        with open(shard_path(path, r, 3), "w") as f:
            f.write("gene,pred\n" + "".join(rows[a:b]))
    merge_sharded_csv(path, delete_shards=True)
    with open(path) as f:
        assert f.read() == "gene,pred\n" + "".join(rows)


def test_assemble_rows():
    parts = [(5, np.full((5, 2), 1.0)), (0, np.full((5, 2), 0.0))]
    out = assemble_rows(parts, 10)
    assert (out[:5] == 0).all() and (out[5:] == 1).all()
    with pytest.raises(AssertionError):
        assemble_rows(parts, 12)
    # overlapping blocks pass a size-only check but leave a garbage gap —
    # must raise on non-contiguous tiling
    with pytest.raises(AssertionError, match="tile contiguously"):
        assemble_rows([(0, np.zeros((6, 2))), (4, np.zeros((4, 2)))], 10)
