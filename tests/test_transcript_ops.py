"""Transcript-stream operators: invariants beyond the DuckDB value gate
for turn supersession (latest-wins upsert) and tool retry-run islands."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from documentai_ocr_spark.queries.relational import (
    _RETRY_DELAY_MS,
    q_tool_retry_runs,
    q_turn_supersede,
)
from documentai_ocr_spark.synth import transcripts_from_documents

SF = "/root/testdata/sf0.001"


def test_supersede_one_row_per_turn_key(spark):
    """Resolution must emit EXACTLY one surviving attempt per
    (conv_id, turn_idx) — the upsert contract. 12 turns per conv."""
    out = q_turn_supersede(spark, SF).cache()
    n_convs = transcripts_from_documents(spark, SF).select(
        "conv_id"
    ).distinct().count()
    assert out.count() == n_convs * 12
    dup = (
        out.groupBy("conv_id", "turn_idx")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    out.unpersist()


def test_supersede_retries_win_by_exact_delay(spark):
    """Every 2-attempt turn's kept_ms is the retry's timestamp — the
    base ts plus exactly the retry delay; 1-attempt turns keep the
    original. Cross-checked against the raw transcripts table."""
    out = q_turn_supersede(spark, SF)
    base = transcripts_from_documents(spark, SF).select(
        "conv_id",
        "turn_idx",
        F.unix_millis("ts").alias("base_ms"),
        F.col("role").alias("base_role"),
    )
    j = out.join(base, ["conv_id", "turn_idx"]).cache()
    assert j.where(~F.col("n_attempts").isin(1, 2)).count() == 0
    bad_retry = j.where(
        (F.col("n_attempts") == 2)
        & (F.col("kept_ms") != F.col("base_ms") + _RETRY_DELAY_MS)
    ).count()
    bad_orig = j.where(
        (F.col("n_attempts") == 1) & (F.col("kept_ms") != F.col("base_ms"))
    ).count()
    bad_role = j.where(F.col("role") != F.col("base_role")).count()
    assert (bad_retry, bad_orig, bad_role) == (0, 0, 0)
    j.unpersist()


def test_retry_runs_partition_tool_turns(spark):
    """Run lengths histogram must partition the tool-turn count exactly:
    sum(run_len * n_runs) == total tool turns, and no run can exceed a
    conversation's 4 tool slots."""
    out = q_tool_retry_runs(spark, SF).cache()
    total = out.select(
        F.sum(F.col("run_len") * F.col("n_runs")).cast("long")
    ).first()[0]
    n_tool_turns = (
        transcripts_from_documents(spark, SF)
        .where(F.col("role") == "tool")
        .count()
    )
    assert total == n_tool_turns
    assert out.where((F.col("run_len") < 1) | (F.col("run_len") > 4)).count() == 0
    # the histogram must actually contain a retry (run_len >= 2) —
    # otherwise the gate is comparing a degenerate all-ones table
    assert out.where(F.col("run_len") >= 2).count() > 0
    out.unpersist()


def test_role_alternation_reconciles_with_integrity(spark):
    """The alternation audit and the integrity audit describe the SAME
    decimated stream: per-conversation turn counts must agree, pairs are
    turns-1, and the damage is real — some conversation has a same-role
    adjacency and some conversation lost its opening user turn."""
    from documentai_ocr_spark.queries.relational import (
        q_role_alternation,
        q_turn_integrity,
    )

    alt = q_role_alternation(spark, SF).cache()
    integ = {
        r["conv_id"]: r["n_turns"]
        for r in q_turn_integrity(spark, SF).collect()
    }
    got = {r["conv_id"]: r["n_turns"] for r in alt.collect()}
    assert got == integ
    assert alt.where(F.col("n_pairs") != F.col("n_turns") - 1).count() == 0
    assert alt.where(F.col("n_same_role") > 0).count() > 0
    assert alt.where(F.col("starts_user") == 0).count() > 0
    alt.unpersist()


def test_conv_profile_role_partition(spark):
    """Role counts partition the turn count; tool diversity is bounded
    by tool-turn count and the 4-tool universe; the span is exactly the
    kept-turn index range in minutes (decimation shrinks it from the
    full 11-minute window for some conversations)."""
    from documentai_ocr_spark.queries.relational import q_conv_profile

    out = q_conv_profile(spark, SF).cache()
    assert (
        out.where(
            F.col("n_user") + F.col("n_assistant") + F.col("n_tool")
            != F.col("n_turns")
        ).count()
        == 0
    )
    assert out.where(
        (F.col("n_distinct_tools") > F.col("n_tool"))
        | (F.col("n_distinct_tools") > 4)
    ).count() == 0
    assert out.where(F.col("span_ms") < 11 * 60000).count() > 0
    assert out.where(F.col("span_ms") > 11 * 60000).count() == 0
    out.unpersist()


def test_prefix_share_monotone_and_nonvacuous(spark):
    """Sharing can only shrink with depth (a shared depth-d prefix
    implies a shared depth-(d-1) prefix), participating conversations
    shrink with depth (shorter groups fall out), and the injected
    system prompt makes depth-1 sharing real."""
    from documentai_ocr_spark.queries.corpusops import q_prefix_share

    rows = {
        r["depth"]: r
        for r in q_prefix_share(spark, SF).collect()
    }
    assert rows[1]["shared_convs"] > 0 and rows[1]["cacheable_frac"] > 0
    for d in range(2, max(rows) + 1):
        assert rows[d]["n_convs"] <= rows[d - 1]["n_convs"]
        assert rows[d]["shared_convs"] <= rows[d - 1]["shared_convs"]
    for r in rows.values():
        assert r["n_prefixes"] <= r["n_convs"]


def test_sft_gate_flags_conjunction_and_each_rule_fires(spark):
    """admitted must equal the conjunction of the four published flags,
    every individual rule must reject at least one conversation on the
    decimated fixture, and the gate must be neither vacuous nor total."""
    from documentai_ocr_spark.queries.relational import q_sft_gate

    out = q_sft_gate(spark, SF).cache()
    n = out.count()
    bad = out.where(
        F.col("admitted")
        != (
            F.col("ok_complete").cast("boolean")
            & F.col("ok_protocol").cast("boolean")
            & F.col("ok_opening").cast("boolean")
            & F.col("ok_volume").cast("boolean")
        ).cast("int")
    ).count()
    assert bad == 0
    for flag in ("ok_complete", "ok_protocol", "ok_opening", "ok_volume"):
        assert out.where(F.col(flag) == 0).count() > 0, flag
    adm = out.where(F.col("admitted") == 1).count()
    assert 0 < adm < n
    out.unpersist()


def test_transcript_curate_composition(spark):
    """The lifecycle composition must (a) emit exactly the q_sft_gate
    admitted set — the gate stage is the same rules over the same
    damaged stream — and (b) show real extraction yield on every
    admitted conversation (spans and chars positive: admitted ≥ 11-turn
    conversations always contain extractable payloads)."""
    from documentai_ocr_spark.queries.extraction import (
        x_transcript_curate,
    )
    from documentai_ocr_spark.queries.relational import q_sft_gate

    out = x_transcript_curate(spark, SF).cache()
    got = {r["conv_id"] for r in out.select("conv_id").collect()}
    want = {
        r["conv_id"]
        for r in q_sft_gate(spark, SF)
        .where(F.col("admitted") == 1)
        .collect()
    }
    assert got == want and got
    assert out.where(F.col("total_spans") <= 0).count() == 0
    assert out.where(F.col("extracted_chars") <= 0).count() == 0
    out.unpersist()


def test_tool_pivot_counts_reconcile(spark):
    """The pivot matrix row-sums must equal the conversation's tool-turn
    count, and column totals must match the flat groupBy."""
    from documentai_ocr_spark.queries.relational import (
        _PIVOT_TOOLS,
        q_tool_pivot,
    )

    out = q_tool_pivot(spark, SF).cache()
    t = transcripts_from_documents(spark, SF)
    flat = {
        r["tool"]: r["n"]
        for r in t.where(F.col("role") == "tool")
        .groupBy("tool")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cols = {
        p: out.agg(F.sum(f"n_{p}")).collect()[0][0] for p in _PIVOT_TOOLS
    }
    assert cols == flat
    n_tool_turns = t.where(F.col("role") == "tool").count()
    total = out.select(
        sum(F.col(f"n_{p}") for p in _PIVOT_TOOLS).alias("s")
    ).agg(F.sum("s")).collect()[0][0]
    assert total == n_tool_turns
    out.unpersist()


def test_turn_renumber_contiguous_and_order_preserving(spark):
    """new_idx is exactly 0..n-1 per conversation, and the old→new map
    is monotone (order preserved) — the contract packing relies on."""
    from documentai_ocr_spark.queries.relational import q_turn_renumber

    out = q_turn_renumber(spark, SF).cache()
    per = out.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("new_idx").alias("lo"),
        F.max("new_idx").alias("hi"),
        F.countDistinct("new_idx").alias("nd"),
    )
    assert per.where(
        (F.col("lo") != 0)
        | (F.col("hi") != F.col("n") - 1)
        | (F.col("nd") != F.col("n"))
    ).count() == 0
    w = Window.partitionBy("conv_id").orderBy("old_idx")
    mono = out.withColumn("prev_new", F.lag("new_idx").over(w))
    assert mono.where(
        F.col("prev_new").isNotNull()
        & (F.col("new_idx") != F.col("prev_new") + 1)
    ).count() == 0
    # it actually renumbers: decimation made some old_idx != new_idx
    assert out.where(F.col("old_idx") != F.col("new_idx")).count() > 0
    out.unpersist()


def test_code_blocks_kernel_hostile_fixtures(spark):
    """code_blocks_col against a pure-Python fence-pairing spec on
    hostile layouts: unclosed trailing fence, adjacent fences (empty
    body), bare ``` (empty lang), fence-first text, no fences, and a
    second opener swallowed as body — the markdown ambiguity both
    sides resolve by strict pairing order."""
    import pandas as pd

    from documentai_ocr_spark.queries.relational import code_blocks_col

    cases = [
        "intro\n```python\nx = 1\nprint(x)\n```\ntail",
        "a\n```text\ndangling",                      # unclosed → 0 blocks
        "```\n```",                                  # empty lang, empty body
        "```sql\nSELECT 1\n```\nmid\n```bash\nls\n```",
        "no fences at all",
        "",
        "x\n```a\nb\n```\n```c\nunclosed2",          # 3 fences → 1 block
    ]

    def spec(text):
        ls = text.split("\n")
        fp = [i + 1 for i, x in enumerate(ls) if x.startswith("```")]
        out = []
        for j in range(len(fp) // 2):
            op, cl = fp[2 * j], fp[2 * j + 1]
            body = "\n".join(ls[op : cl - 1])
            out.append(
                (j, ls[op - 1][3:], cl - op - 1, len(body), body)
            )
        return out

    df = spark.createDataFrame(
        pd.DataFrame({"rid": range(len(cases)), "txt": cases})
    )
    got = {
        r.rid: [
            (b.block_no, b.lang, b.n_code_lines, b.n_code_chars, b.code)
            for b in r.blocks
        ]
        for r in df.select(
            "rid", code_blocks_col(F.col("txt")).alias("blocks")
        ).collect()
    }
    for i, text in enumerate(cases):
        assert got[i] == spec(text), (i, got[i], spec(text))


def test_ts_skew_hand_computed(spark, tmp_path):
    """q_ts_skew on a crafted 3-doc corpus: recompute the coin and the
    running-max regression in pure Python from the synth ts contract
    (base + doc hours + turn minutes, skewed turns shifted back 150 s)
    and require exact equality on every audit column."""
    import hashlib

    import pandas as pd

    from documentai_ocr_spark.queries.relational import (
        _TS_SKEW_MOD,
        _TS_SKEW_MS,
        q_ts_skew,
    )

    pd.DataFrame(
        [{"doc_id": i, "text": f"w{i} " * 30} for i in range(3)]
    ).to_parquet(tmp_path / "documents.parquet")

    def coin(d, t):
        h = hashlib.md5(f"{d}@{t}".encode()).hexdigest()
        return int(h[:8], 16)

    exp = {}
    for d in range(3):
        ms = [
            t * 60_000
            - (_TS_SKEW_MS if coin(d, t) % _TS_SKEW_MOD == 7 else 0)
            for t in range(12)
        ]
        n_reg, max_reg, run = 0, 0, None
        for v in ms:
            if run is not None and run > v:
                n_reg += 1
                max_reg = max(max_reg, run - v)
            run = v if run is None else max(run, v)
        exp[d] = (12, n_reg, max_reg, max(ms) - min(ms))

    got = {
        r.doc_id: (r.n_turns, r.n_regress, r.max_regress_ms, r.span_ms)
        for r in q_ts_skew(spark, str(tmp_path)).collect()
    }
    assert got == exp
    # the fixture (or, at worst, the real corpus) must exercise a
    # regression somewhere for the audit to be non-vacuous
    if all(v[1] == 0 for v in exp.values()):
        real = q_ts_skew(spark, SF)
        assert real.where(F.col("n_regress") > 0).count() > 0


def test_seqlen_waste_closed_form(spark, tmp_path):
    """q_seqlen_waste on two sources with known token counts: every
    column equals the closed form, pack waste <= pad waste at every L
    (packing dominates padding), and both are 0 when L divides
    everything."""
    import pandas as pd

    from documentai_ocr_spark.queries.textstats import (
        _SEQLEN_GRID,
        q_seqlen_waste,
    )

    # source a: docs of 100 and 28 tokens; source b: one 300-token doc
    rows = [
        {"doc_id": 0, "source": "a", "text": " ".join(["x"] * 100)},
        {"doc_id": 1, "source": "a", "text": " ".join(["y"] * 28)},
        {"doc_id": 2, "source": "b", "text": " ".join(["z"] * 300)},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    ns = {"a": [100, 28], "b": [300]}

    got = {
        r.seq_len: r for r in q_seqlen_waste(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(_SEQLEN_GRID)
    total = sum(sum(v) for v in ns.values())
    for L in _SEQLEN_GRID:
        pad = sum((n + L - 1) // L * L for v in ns.values() for n in v)
        pack = sum((sum(v) + L - 1) // L * L for v in ns.values())
        r = got[L]
        assert (
            r.total_tokens,
            r.pad_tokens,
            r.pack_tokens,
            r.pad_waste_milli,
            r.pack_waste_milli,
        ) == (
            total,
            pad,
            pack,
            (pad - total) * 1000 // pad,
            (pack - total) * 1000 // pack,
        )
        assert r.pack_waste_milli <= r.pad_waste_milli


def test_code_blocks_oracle_on_backtick_corpus(spark, tmp_path):
    """Spark vs DuckDB on a corpus whose document WORDS start with
    backticks: the synthesized base line itself becomes a fence line,
    producing adjacent fences (empty-body blocks) and odd fence counts
    — the inputs where array_to_string(empty)=NULL once diverged from
    array_join(empty)=''. Full multiset equality of the query against
    its registered oracle."""
    import duckdb
    import pandas as pd

    from documentai_ocr_spark.queries import ORACLES, QUERIES

    rows = [
        {
            "doc_id": i,
            "text": " ".join(["```w%d" % k for k in range(40)]),
        }
        for i in range(6)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")

    got = sorted(
        tuple(r) for r in QUERIES["q_code_blocks"](spark, str(tmp_path))
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(
        ORACLES["q_code_blocks"]
    ).fetchall())
    assert got, "backtick corpus must actually produce blocks"
    # some block must exercise the empty-body path for the test to bite
    assert any(r[5] == 0 for r in got), "no empty-body block produced"
    assert got == want


def test_code_ratio_reconciles_with_code_blocks(spark):
    """q_code_ratio rides the SAME fence scan as q_code_blocks, so per
    conversation its (n_blocks, code_chars, n_langs) must equal the
    blocks table's own rollup exactly — and every conversation in the
    turn stream appears, zero-code ones with all-zero counts."""
    from documentai_ocr_spark.queries.relational import (
        q_code_blocks,
        q_code_ratio,
    )

    sf = "/root/testdata/sf0.001"
    ratio = {r["doc_id"]: r for r in q_code_ratio(spark, sf).collect()}
    blocks = {}
    for b in q_code_blocks(spark, sf).collect():
        d = blocks.setdefault(b["doc_id"], {"n": 0, "chars": 0, "langs": set()})
        d["n"] += 1
        d["chars"] += b["n_code_chars"]
        d["langs"].add(b["lang"])

    assert ratio, "ratio must cover the corpus"
    assert set(blocks) <= set(ratio)
    for doc_id, r in ratio.items():
        d = blocks.get(doc_id, {"n": 0, "chars": 0, "langs": set()})
        assert r["n_blocks"] == d["n"]
        assert r["code_chars"] == d["chars"]
        assert r["n_langs"] == len(d["langs"])
        assert r["code_milli"] == d["chars"] * 1000 // r["total_chars"]
    # the coverage must include genuinely zero-code conversations for
    # the LEFT JOIN's COALESCE arm to be exercised
    assert any(r["n_blocks"] == 0 for r in ratio.values())


def test_edit_churn_reconciles_with_supersede(spark):
    """q_edit_churn and q_turn_supersede share the retry coin: per
    conversation, churn's n_retried must equal the count of turn keys
    supersession resolved with n_attempts == 2 — the two operators
    describe the SAME regeneration set."""
    from documentai_ocr_spark.queries.relational import (
        q_edit_churn,
        q_turn_supersede,
    )

    churn = {
        r.doc_id: r.n_retried for r in q_edit_churn(spark, SF).collect()
    }
    sup = (
        q_turn_supersede(spark, SF)
        .where(F.col("n_attempts") == 2)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sup_by_doc = {int(r.conv_id[5:]): r.n for r in sup}
    assert churn == sup_by_doc
    assert churn  # non-vacuous: some conversation was retried
