"""Persistent tree: config parsing, persistence/reload, pmtree dispatch.

Behavior parity with rln/src/pm_tree_adapter.rs and rln/tests/pm_tree.rs
(persistence/reload incl. occupancy-cache rebuild, metadata, temporary
cleanup, depth checks, override_range dispatch with empty indices allowed).
"""

import os

import pytest

from zerokit_tpu.tree.merkle import InvalidDepth, InvalidLeaf, OptimalMerkleTree
from zerokit_tpu.tree.pmtree import FromConfigError, PmTree, PmTreeConfig


def _cfg(tmp_path, name="tree.db", extra=""):
    path = os.path.join(str(tmp_path), name)
    return PmTreeConfig.from_json(
        '{"path": "%s", "temporary": false, "flush_every_ms": 0%s}' % (path, extra)
    )


def test_config_defaults_and_json(tmp_path):
    cfg = PmTreeConfig.from_json("{}")
    assert cfg.temporary is True
    assert cfg.cache_capacity == 1073741824
    assert cfg.flush_every_ms == 500
    assert cfg.mode == "HighThroughput"
    assert cfg.use_compression is False
    cfg2 = _cfg(tmp_path, extra=', "mode": "LowSpace", "cache_capacity": 7')
    assert cfg2.mode == "LowSpace"
    assert cfg2.cache_capacity == 7
    with pytest.raises(FromConfigError):
        PmTreeConfig.create(path=None, temporary=False)


def test_persistence_reload_and_occupancy(tmp_path):
    cfg = _cfg(tmp_path)
    t = PmTree(4, cfg)
    t.set_range(0, [11, 22, 33])
    t.delete(1)
    t.set_metadata(b"app metadata")
    root = t.root()
    t.flush()
    t.close_db_connection()

    t2 = PmTree(4, _cfg(tmp_path))
    assert t2.root() == root
    assert t2.metadata() == b"app metadata"
    assert t2.leaves_set() == 3
    assert t2.get_empty_leaves_indices() == [1]
    # matches a freshly built in-memory tree
    ref = OptimalMerkleTree(4)
    ref.set_range(0, [11, 22, 33])
    ref.delete(1)
    assert t2.root() == ref.root()


def test_depth_mismatch_rejected(tmp_path):
    cfg = _cfg(tmp_path)
    t = PmTree(4, cfg)
    t.set(0, 1)
    t.flush()
    t.close_db_connection()
    with pytest.raises(InvalidDepth):
        PmTree(5, _cfg(tmp_path))


def test_temporary_cleanup():
    cfg = PmTreeConfig.from_json("{}")
    t = PmTree(3, cfg)
    t.set(0, 5)
    t.flush()
    assert os.path.exists(cfg.path)
    t.close_db_connection()
    assert not os.path.exists(cfg.path)


def test_temporary_path_exists_rejected(tmp_path):
    path = os.path.join(str(tmp_path), "exists.db")
    with open(path, "w") as f:
        f.write("x")
    with pytest.raises(FromConfigError):
        PmTreeConfig.create(path=path, temporary=True)


def test_override_range_dispatch(tmp_path):
    t = PmTree(4, _cfg(tmp_path))
    # set-only override (empty indices allowed, unlike Full/Optimal)
    t.override_range(0, [1, 2, 3], [])
    assert [t.get(i) for i in range(3)] == [1, 2, 3]
    # single-set and single-delete fast paths
    t.override_range(3, [9], [])
    assert t.get(3) == 9
    t.override_range(0, [], [3])
    assert t.get(3) == 0
    # combined removes + writes
    t.override_range(2, [77, 88], [0, 1])
    assert t.get(0) == 0 and t.get(1) == 0
    assert t.get(2) == 77 and t.get(3) == 88
    # no leaves, no indices -> error
    with pytest.raises(InvalidLeaf):
        t.override_range(0, [], [])
    t.close_db_connection()


def test_delete_never_set_errors(tmp_path):
    t = PmTree(4, _cfg(tmp_path))
    t.set(0, 1)
    with pytest.raises(InvalidLeaf):
        t.delete(2)  # pmtree errors on deleting beyond next_index
    t.close_db_connection()


def test_proof_and_verify(tmp_path):
    t = PmTree(5, _cfg(tmp_path))
    t.set_range(0, list(range(1, 9)))
    proof = t.proof(4)
    assert t.verify(t.get(4), proof)
    assert proof.leaf_index() == 4
    t.close_db_connection()


def test_compression_roundtrip(tmp_path):
    from zerokit_tpu.tree.pmtree import MAGIC_Z2 as MAGIC_Z, PmTree, PmTreeConfig

    path = str(tmp_path / "ztree.db")
    cfg = PmTreeConfig.create(path=path, temporary=False, use_compression=True)
    t = PmTree(4, cfg)
    for i in range(5):
        t.set(i, 100 + i)
    t.set_metadata(b"zipped")
    t.flush()
    root = t.root()
    with open(path, "rb") as f:
        assert f.read(len(MAGIC_Z)) == MAGIC_Z
    cfg2 = PmTreeConfig.create(path=path, temporary=False, use_compression=True)
    t2 = PmTree(4, cfg2)
    assert t2.root() == root
    assert t2.metadata() == b"zipped"
    assert t2.get(3) == 103


def test_cache_capacity_write_buffer_flush(tmp_path):
    from zerokit_tpu.tree.pmtree import PmTree, PmTreeConfig

    path = str(tmp_path / "cap.db")
    # huge flush interval so only the write-buffer bound can trigger a flush
    cfg = PmTreeConfig.create(
        path=path, temporary=False, flush_every_ms=10_000_000, cache_capacity=120
    )
    t = PmTree(4, cfg)
    t.set(0, 1)
    t.set(1, 2)
    # 2 writes * 40B < 120B: buffered, nothing durable yet
    assert not os.path.exists(path) and not os.path.exists(path + ".journal")
    t.set(2, 3)  # 3 * 40 >= 120 -> journal append (O(delta) durability)
    assert os.path.exists(path + ".journal")


def test_journal_delta_io_and_reload(tmp_path):
    """Incremental durability is O(delta): between snapshots, writes append
    40-byte journal records instead of rewriting the full leaf set; reload
    replays snapshot + journal; a torn tail record is tolerated."""
    import os
    import struct

    from zerokit_tpu.tree.pmtree import PmTree, PmTreeConfig

    path = str(tmp_path / "tree.db")
    cfg = PmTreeConfig.create(
        path=path, temporary=False, cache_capacity=120, flush_every_ms=10**9
    )
    t = PmTree(4, cfg)
    t.set(0, 111)  # pending (40B < 120B capacity): no I/O yet
    assert not os.path.exists(path + ".journal")
    t.set(1, 222)
    t.set(2, 333)  # 3*40 >= 120 -> journal append, snapshot untouched
    assert os.path.exists(path + ".journal")
    assert not os.path.exists(path)  # no full snapshot written yet
    jsize = os.path.getsize(path + ".journal")
    t.set(3, 444)
    t.set(4, 555)
    t.set(5, 666)
    grown = os.path.getsize(path + ".journal")
    assert grown > jsize  # appends, not rewrites
    root_before = t.root()
    # reload WITHOUT closing (journal replay path; no snapshot exists)
    t2 = PmTree(4, cfg)
    assert t2.root() == root_before
    assert t2.get(4) == 555
    assert t2.leaves_set() == 6

    # torn tail: truncate mid-record; earlier records still apply
    with open(path + ".journal", "ab") as f:
        f.write(b"\x00" + struct.pack("<Q", 7))  # leaf record missing value
    t3 = PmTree(4, cfg)
    assert t3.root() == root_before

    # explicit flush compacts: snapshot written, journal gone
    t.flush()
    assert os.path.exists(path)
    assert not os.path.exists(path + ".journal")
    t4 = PmTree(4, cfg)
    assert t4.root() == root_before
    t.close_db_connection()


def test_stale_journal_skipped_after_compaction_crash(tmp_path):
    """Crash between snapshot replace and journal unlink must NOT replay the
    pre-compaction journal over the newer snapshot (generation stamping)."""
    import shutil

    from zerokit_tpu.tree.pmtree import PmTree, PmTreeConfig

    path = str(tmp_path / "tree.db")
    cfg = PmTreeConfig.create(
        path=path, temporary=False, cache_capacity=40, flush_every_ms=10**9
    )
    t = PmTree(4, cfg)
    t.set(0, 111)  # journal append (cache_capacity=40 -> immediate)
    journal = path + ".journal"
    assert os.path.exists(journal)
    stale = str(tmp_path / "stale.journal")
    shutil.copy(journal, stale)  # the journal as of generation g
    t.flush()  # compaction: snapshot at generation g+1, journal unlinked
    t.set(0, 999)  # post-compaction value, journaled then compacted again
    t.flush()
    root_after = t.root()
    # simulate the crash window: stale journal resurfaces next to the
    # newer snapshot
    shutil.copy(stale, journal)
    t2 = PmTree(4, cfg)
    assert t2.get(0) == 999  # stale record (0 -> 111) must not re-apply
    assert t2.root() == root_after
    assert not os.path.exists(journal)  # stale journal discarded on open
