"""Release-audit rollup: reconciliation against the component reports
it composes (definitional reuse pinned as a regression gate) and an
engineered corpus where the verdict provably discriminates."""

import pandas as pd

from documentai_ocr_spark.queries.corpusops import q_dataset_card
from documentai_ocr_spark.queries.governance import (
    _REL_DUP_MILLI,
    _REL_KL,
    _REL_OUT_MILLI,
    q_release_audit,
)
from documentai_ocr_spark.queries.relevance import q_robust_stats, q_source_kl
from documentai_ocr_spark.queries.textstats import _KANON_K, q_k_anonymity

SF = "/root/testdata/sf0.001"


def test_release_audit_reconciles_with_components(spark):
    """Every column equals the component report's own published value,
    and the blocker count is exactly the published-column arithmetic."""
    audit = {r["source"]: r for r in q_release_audit(spark, SF).collect()}
    card = {r["source"]: r for r in q_dataset_card(spark, SF).collect()}
    kan = {r["source"]: r for r in q_k_anonymity(spark, SF).collect()}
    rob = {r["source"]: r for r in q_robust_stats(spark, SF).collect()}
    kl = {r["source"]: r for r in q_source_kl(spark, SF).collect()}
    # the audit anchors on the card — its row set, exactly
    assert set(audit) == set(card)
    for src, a in audit.items():
        assert (a["n_docs"], a["tok_total"], a["dup_milli"], a["n_empty"]) == (
            card[src]["n_docs"],
            card[src]["tok_total"],
            card[src]["dup_milli"],
            card[src]["n_empty"],
        )
        assert (a["k_anonymous"], a["risk_milli"]) == (
            kan[src]["k_anonymous"],
            kan[src]["risk_milli"],
        )
        assert (a["med"], a["mad"], a["outlier_milli"]) == (
            rob[src]["med"],
            rob[src]["mad"],
            rob[src]["outlier_milli"],
        )
        assert a["kl"] == (kl[src]["kl"] if src in kl else None)
        blockers = (
            int(not (a["k_anonymous"] or False))
            + int(a["dup_milli"] > _REL_DUP_MILLI)
            + int(
                True
                if a["outlier_milli"] is None
                else a["outlier_milli"] > _REL_OUT_MILLI
            )
            + int(True if a["kl"] is None else a["kl"] > _REL_KL)
            + int(a["n_empty"] > 0)
        )
        assert a["n_blockers"] == blockers
        assert a["release_ok"] == (blockers == 0)


def test_release_audit_verdict_discriminates(spark, tmp_path):
    """A clean source releases; a source with a singleton QI class AND
    heavy duplication is blocked with the right blocker count."""
    rows = []
    # clean: one big QI class (same lang, same len bucket), all distinct
    # texts drawn from one vocabulary, no dups, no outliers
    texts = [
        f"alpha beta gamma delta t{i % 7} u{i % 5}"
        for i in range(4 * _KANON_K)
    ]
    for i, t in enumerate(texts):
        rows.append((i, t, "en", "clean"))
    # dirty: an exact text-copy of clean (its word distribution is
    # proportional to the corpus marginal → KL ≈ 0, so the KL check
    # provably does NOT fire) — every doc loses the corpus-global
    # keeper election to clean's earlier doc_id (dup blocker), and one
    # odd-lang copy forms a singleton QI class (k-anonymity blocker)
    for i, t in enumerate(texts):
        rows.append((100 + i, t, "en", "dirty"))
    rows.append((200, texts[0], "xx", "dirty"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "rel")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    got = {r["source"]: r for r in q_release_audit(spark, d).collect()}
    assert got["clean"]["release_ok"] and got["clean"]["n_blockers"] == 0
    dirty = got["dirty"]
    assert not dirty["release_ok"]
    assert not dirty["k_anonymous"]
    assert dirty["dup_milli"] > _REL_DUP_MILLI
    assert dirty["n_blockers"] >= 2


def test_release_audit_fails_closed_on_all_empty_source(spark, tmp_path):
    """An all-empty source has no q_source_kl row: the audit must KEEP
    its row (anchored on the dataset card) with the missing check
    counted as a blocker — absence must read as BLOCKED, never as
    'nothing to review'."""
    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma word" + str(i % 3), "en", "ok"))
    for i in range(100, 106):
        rows.append((i, "", "en", "void"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = str(tmp_path / "void")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    got = {r["source"]: r for r in q_release_audit(spark, d).collect()}
    assert "void" in got
    v = got["void"]
    assert v["kl"] is None
    assert not v["release_ok"]
    # empty-docs blocker AND the missing-KL fail-closed blocker
    assert v["n_blockers"] >= 2
