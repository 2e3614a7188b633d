"""Shard manifest, stage logger, timer."""

import io
import json

from expecto_tpu.utils.manifest import ShardManifest
from expecto_tpu.utils.profiling import StageLogger
from expecto_tpu.utils.timing import Timer


class TestManifest:
    def test_resume_cycle(self, tmp_path):
        m = ShardManifest(tmp_path / "m.json", items=["g1", "g2", "g3"])
        assert sorted(m.pending()) == ["g1", "g2", "g3"]
        out = tmp_path / "g1.h5"
        out.write_text("x")
        m.mark_done("g1", output=str(out))
        m.mark_failed("g2", "boom")

        # fresh process resumes from disk
        m2 = ShardManifest(tmp_path / "m.json")
        assert sorted(m2.pending()) == ["g2", "g3"]
        assert m2.done() == ["g1"]
        assert not m2.is_complete()
        assert m2.verify_outputs() == []

        out.unlink()
        assert m2.verify_outputs() == ["g1"]

    def test_new_items_merge(self, tmp_path):
        m = ShardManifest(tmp_path / "m.json", items=["a"])
        m.mark_done("a")
        m2 = ShardManifest(tmp_path / "m.json", items=["a", "b"])
        assert m2.pending() == ["b"]


class TestStageLogger:
    def test_json_lines(self):
        buf = io.StringIO()
        log = StageLogger(stream=buf, run_id="r1")
        with log.stage("encode", n_items=100, unit="windows"):
            pass
        rec = json.loads(buf.getvalue())
        assert rec["stage"] == "encode" and rec["n"] == 100
        assert rec["run_id"] == "r1" and rec["per_sec"] is not None


def test_timer():
    t = Timer()
    with t.stage("a"):
        pass
    assert "a" in t.stages and "a:" in t.report()
