"""Per-document wall-clock budget (§2A#14): the reference bounds every Tika
transfer at 100 minutes (/root/reference/src/java-env.cpp:229-231); the
rebuild bounds each guarded document's extraction. A document over budget
becomes a ``parse_ok=false, error='timeout: ...'`` row — NEVER a task
failure or a stalled task."""

from __future__ import annotations

import time

from tika_wrap_spark.operators.extract_ops import (
    _extract_with_timeout,
    extract_spans,
)


def _slow_fn(delay):
    def fn(spans):
        time.sleep(delay)
        return {"spans": [], "parse_ok": True, "error": "", "meta": {"slow": "1"}}

    return fn


class TestGuardPure:
    def test_timeout_becomes_error_row(self):
        res = _extract_with_timeout([], 0.05, fn=_slow_fn(2.0))
        assert not res["parse_ok"]
        assert res["error"].startswith("timeout:")
        assert res["spans"] == [] and res["meta"] == {}

    def test_pool_respawns_after_timeout(self):
        # a stuck document must not poison the guard for later documents
        bad = _extract_with_timeout([], 0.05, fn=_slow_fn(2.0))
        assert not bad["parse_ok"]
        ok = _extract_with_timeout([], 5.0, fn=_slow_fn(0.0))
        assert ok["parse_ok"] and ok["meta"] == {"slow": "1"}

    def test_within_budget_result_identical(self):
        from tika_wrap_spark.core.extract import extract_document

        spans = [{"kind": "text", "text": "hello guarded world", "media_ref": "", "offset": 0}]
        assert _extract_with_timeout(spans, 60.0) == extract_document(spans)


def _monster_pdf(n_lines: int) -> str:
    lines = ["%PDF-1.4", "%%Page: 1"]
    for i in range(n_lines):
        lines.append("BT 72.0 %.1f Td (pathological line %d content) Tj ET" % (720.0 - i, i))
    lines.append("%%EOF")
    return "\n".join(lines)


def test_spark_timeout_is_row_not_task_failure(spark):
    """End-to-end: a pathological giant stalls past the budget and becomes a
    timeout row; small documents in the same batch skip the guard and
    extract normally."""
    rows = [
        ("doc_fast_%d" % i, [("text", "quick doc %d body" % i, "", 0)])
        for i in range(6)
    ]
    rows.append(("doc_monster", [("pdf", _monster_pdf(400_000), "", 0)]))
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = {
        r["doc_id"]: r
        for r in extract_spans(df.repartition(2), doc_timeout_s=0.2, guard_min_chars=10_000).collect()
    }
    assert len(out) == 7
    monster = out["doc_monster"]
    assert not monster["parse_ok"]
    assert monster["error"].startswith("timeout:")
    for i in range(6):
        assert out["doc_fast_%d" % i]["parse_ok"]
