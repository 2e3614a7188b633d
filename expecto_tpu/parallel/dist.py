"""Multi-host execution helpers: deterministic work sharding and host-local
sharded output with bit-identical merge order (SURVEY §2.3).

The reference scales across nodes by chunk flags + shell loops + glob/concat
mergers. Here each host takes a deterministic contiguous row range of the
global work list, computes on its local devices, and writes
``<stem>.shard{r:05d}-of-{w:05d}<ext>`` files; ``merge_sharded_h5`` /
``assemble_rows`` reassemble in shard order, so merged output is
bit-identical to a single-host run regardless of how many hosts ran.
"""

from __future__ import annotations

import glob
import os
import re

import h5py
import numpy as np


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of this host in the jax runtime —
    (0, 1) in single-process runs."""
    import jax

    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the host that owns single-writer outputs (merged files,
    diagnostics prints) — process 0, or any host in a single-process run."""
    import jax

    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Block until every host reaches this point (no-op single-process).
    Used before a primary-host merge so all shard files exist."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_row_range(n_rows: int, process_index: int | None = None, process_count: int | None = None) -> tuple[int, int]:
    """Contiguous [start, stop) row range owned by this host. Deterministic:
    the first ``n % w`` hosts take one extra row."""
    import jax

    r = jax.process_index() if process_index is None else process_index
    w = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_rows, w)
    start = r * base + min(r, extra)
    stop = start + base + (1 if r < extra else 0)
    return start, stop


def shard_path(path: str, process_index: int | None = None, process_count: int | None = None) -> str:
    """``out.h5`` -> ``out.shard00002-of-00008.h5`` (unchanged on 1 host)."""
    import jax

    r = jax.process_index() if process_index is None else process_index
    w = jax.process_count() if process_count is None else process_count
    if w == 1:
        return path
    stem, ext = os.path.splitext(path)
    return f"{stem}.shard{r:05d}-of-{w:05d}{ext}"


def list_shards(path: str) -> list[str]:
    """All shard files for a logical path, in shard order; [path] if the
    unsharded file exists and no shards do.

    Shard files take precedence over a pre-existing merged file: a
    distributed rerun into an output dir that already holds a previous run's
    merged output must merge the FRESH shards over it, not silently serve
    the stale file (the mergers write atomically via os.replace, so a
    half-merged file never shadows the shards either)."""
    stem, ext = os.path.splitext(path)
    by_index: dict[int, str] = {}
    worlds = set()
    for fpath in sorted(glob.glob(f"{stem}.shard*-of-*{ext}")):
        m = re.search(r"shard(\d{5})-of-(\d{5})", fpath)
        if m is None:
            continue  # hand-named stragglers don't belong to this shard set
        by_index[int(m.group(1))] = fpath
        worlds.add(int(m.group(2)))
    if not by_index:
        return [path] if os.path.exists(path) else []
    # every file must agree on the world size AND indices must be exactly
    # 0..N-1 — shard files left behind by a run with a different host count
    # (e.g. a 2-host set mixed with a partial 4-host rerun) must not be
    # silently merged together
    if len(worlds) != 1:
        raise AssertionError(
            f"mixed shard sets for {path}: world sizes {sorted(worlds)} — "
            "remove stale shards from a previous run before merging"
        )
    expected = worlds.pop()
    if sorted(by_index) != list(range(expected)):
        raise AssertionError(
            f"expected shards 0..{expected - 1} for {path}, found indices {sorted(by_index)}"
        )
    return [by_index[i] for i in range(expected)]


def merge_sharded_h5(path: str, out_path: str | None = None, delete_shards: bool = False, fold_axis0: int = 1) -> str:
    """Concatenate shard h5 files (row axis 0 of every dataset) in shard
    order into the logical file. Bit-identical to the single-host write.

    ``fold_axis0``: number of equal row segments each shard's datasets carry.
    The per-shift chromatin h5s stack forward rows then reverse-complement
    rows ([fwd; rc], io/h5.py) — with ``fold_axis0=2`` the merged file is
    [fwd_shard0..fwd_shardK; rc_shard0..rc_shardK], matching the single-host
    layout instead of interleaving the halves per shard."""
    shards = list_shards(path)
    if not shards:
        raise FileNotFoundError(path)
    out_path = out_path or path
    if shards == [path]:
        return path
    # stream shard-by-shard into preallocated datasets: peak memory is one
    # shard, not 2x the merged file (shift h5s run to multiple GB)
    shapes: dict[str, tuple] = {}
    dtypes: dict[str, np.dtype] = {}
    shard_rows: dict[str, list[int]] = {}
    for s in shards:
        with h5py.File(s, "r") as f:
            for name in f:
                shape, dtype = f[name].shape, f[name].dtype
                if shape[0] % fold_axis0:
                    raise AssertionError(
                        f"shard dataset {name} in {s} has {shape[0]} rows, not divisible by fold {fold_axis0}"
                    )
                if name in shapes:
                    if shapes[name][1:] != shape[1:]:
                        raise AssertionError(f"shard dataset {name} trailing shape mismatch")
                    if dtypes[name] != dtype:
                        # h5py would silently cast on write (e.g. one host in
                        # fp32 parity mode merged into fp16 production shards)
                        raise AssertionError(
                            f"shard dataset {name} dtype mismatch: {dtypes[name]} vs {dtype} in {s}"
                        )
                    shapes[name] = (shapes[name][0] + shape[0],) + shape[1:]
                else:
                    shapes[name], dtypes[name] = shape, dtype
                shard_rows.setdefault(name, []).append(shape[0])
    for name, rows in shard_rows.items():
        if len(rows) != len(shards):
            raise AssertionError(f"dataset {name} missing from some shards of {path}")
    with h5py.File(out_path + ".tmp", "w") as out:
        dsets = {name: out.create_dataset(name, shape=shapes[name], dtype=dtypes[name]) for name in shapes}
        # segment k of the merged file starts where all shards' first k
        # segments end; within it shards contribute in shard order
        seg_total = {name: shapes[name][0] // fold_axis0 for name in shapes}
        seg_done = {name: 0 for name in shapes}  # rows of earlier shards, per segment
        for s in shards:
            with h5py.File(s, "r") as f:
                for name in f:
                    n = f[name].shape[0]
                    seg = n // fold_axis0
                    for k in range(fold_axis0):
                        o = k * seg_total[name] + seg_done[name]
                        dsets[name][o : o + seg] = f[name][k * seg : (k + 1) * seg]
                    seg_done[name] += seg
    os.replace(out_path + ".tmp", out_path)
    if delete_shards:
        for s in shards:
            os.remove(s)
    return out_path


def merge_sharded_npy(path: str, out_path: str | None = None, delete_shards: bool = False) -> str:
    """Concatenate shard ``.npy`` files (axis 0) in shard order into the
    logical file (the gene-feature matrix path)."""
    shards = list_shards(path)
    if not shards:
        raise FileNotFoundError(path)
    out_path = out_path or path
    if shards == [path]:
        return path
    merged = np.concatenate([np.load(s) for s in shards], axis=0)
    with open(out_path + ".tmp", "wb") as f:
        np.save(f, merged)
    os.replace(out_path + ".tmp", out_path)
    if delete_shards:
        for s in shards:
            os.remove(s)
    return out_path


def merge_sharded_csv(path: str, out_path: str | None = None, delete_shards: bool = False, header: bool = True) -> str:
    """Concatenate shard CSV/TSV files in shard order, keeping the first
    shard's header line only (the ref_preds.csv / sed.tsv paths)."""
    shards = list_shards(path)
    if not shards:
        raise FileNotFoundError(path)
    out_path = out_path or path
    if shards == [path]:
        return path
    chunks: list[str] = []
    for i, s in enumerate(shards):
        with open(s) as f:
            text = f.read()
        if header and i > 0:
            text = text.split("\n", 1)[1] if "\n" in text else ""
        chunks.append(text)
    with open(out_path + ".tmp", "w") as f:
        f.write("".join(chunks))
    os.replace(out_path + ".tmp", out_path)
    if delete_shards:
        for s in shards:
            os.remove(s)
    return out_path


#: per-process exchange counter; all processes issue exchanges in the same
#: program order, so the stamped sequence numbers agree across hosts
_EXCHANGE_SEQ = 0


def exchange_row_blocks(arrays: dict[str, np.ndarray], tmp_dir: str, tag: str) -> dict[str, np.ndarray]:
    """Share per-host contiguous row blocks through the filesystem: each host
    writes its block (the ``host_row_range`` slice, in global row order) as
    one npz shard; after a barrier every host assembles and returns the full
    arrays. The wire format is exact (raw float bits, no CSV round-trip), so
    assembled arrays are bit-identical to a single-process computation of
    row-independent kernels. Single-process: returns ``arrays`` unchanged.

    Replaces the reference's chunk-CSV + merge_predict_batched.py:10-30
    scale-out for the serving/scoring paths.

    Repeated exchanges with the same (tmp_dir, tag) are safe: every call
    stamps a per-process sequence number into the shard filenames, so a
    second call's writes can never race the primary's deletion of the
    first call's shards (all processes issue exchanges in the same program
    order, so the counters agree across hosts)."""
    rank, world = process_info()
    if world == 1:
        return arrays
    os.makedirs(tmp_dir, exist_ok=True)
    global _EXCHANGE_SEQ
    seq = _EXCHANGE_SEQ
    _EXCHANGE_SEQ += 1
    path = os.path.join(tmp_dir, f".exchange_{tag}.{seq:04d}.npz")
    own = shard_path(path)
    np.savez(own, **arrays)
    barrier(f"exchange.{tag}.written")
    # desync diagnostic at the point of failure (ADVICE r3): the (tag, seq)
    # identity lives in the shard stem, so if some process issued an
    # exchange the others did not, the lagging processes write a DIFFERENT
    # stem and this stem's shard set comes up short. Name the cause here
    # instead of letting the generic shard-set assertion fire confusingly.
    missing = [r for r in range(world) if not os.path.exists(shard_path(path, process_index=r))]
    if missing:
        raise AssertionError(
            f"exchange {tag!r} (seq {seq}) is missing shard(s) from process(es) "
            f"{missing} after the write barrier — the per-process exchange "
            "counters have desynced (some process issued an exchange the "
            "others did not; exchanges must run in identical program order "
            "on every process)"
        )
    shards = list_shards(path)
    per_key: dict[str, list[np.ndarray]] = {}
    for s in shards:
        if os.path.abspath(s) == os.path.abspath(own):
            # this host's block is already in memory — skip re-reading ~1/W
            # of the payload over the shared filesystem
            for k, v in arrays.items():
                per_key.setdefault(k, []).append(v)
            continue
        with np.load(s) as f:
            for k in f.files:
                per_key.setdefault(k, []).append(f[k])
    merged = {k: np.concatenate(v, axis=0) for k, v in per_key.items()}
    barrier(f"exchange.{tag}.read")
    if is_primary():
        for s in shards:
            os.remove(s)
    return merged


def assemble_rows(parts: list[tuple[int, np.ndarray]], n_rows: int) -> np.ndarray:
    """Place (start, block) pairs into a (n_rows, ...) array (in-memory
    merge for collectives-free host gathers)."""
    out = np.empty((n_rows,) + parts[0][1].shape[1:], dtype=parts[0][1].dtype)
    # blocks must tile [0, n_rows) exactly — a size-only check would accept
    # overlapping parts and leave an uninitialized np.empty gap
    end = 0
    for start, block in sorted(parts, key=lambda p: p[0]):
        if start != end:
            raise AssertionError(f"row blocks must tile contiguously: block at {start}, expected {end}")
        out[start : start + block.shape[0]] = block
        end = start + block.shape[0]
    if end != n_rows:
        raise AssertionError(f"assembled {end} rows, expected {n_rows}")
    return out
