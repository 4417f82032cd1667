"""Label-spec mini-DSL: the Catalyst regex+sequence operator must match
the reference state-machine semantics
(/root/reference/mocov1/cls/pdpd/datapreprocess.py:20-94), checked
against an independent straight-line Python model."""


from documentai_ocr_spark.queries.labeldsl import label_spec_indices


def model(spec):
    """Independent per-string model of the DSL (returns (indices,
    important) or None for malformed)."""
    import re

    m = re.match(r"^(\d+)(?:-(\d+)|\+(\d+)|(\++))?(\**)$", spec)
    if not m:
        return None
    a = int(m.group(1))
    if m.group(2):
        idx = list(range(a, int(m.group(2)) + 1))
    elif m.group(3):
        idx = list(range(a, a + int(m.group(3)) + 1))
    elif m.group(4):
        idx = list(range(a, a + len(m.group(4)) + 1))
    else:
        idx = [a]
    return idx, bool(m.group(5))


CASES = {
    "35": ([35], False),
    "35*": ([35], True),
    "35**": ([35], True),
    "35-40": (list(range(35, 41)), False),
    "35-40*": (list(range(35, 41)), True),
    "35+3": ([35, 36, 37, 38], False),
    "35+0": ([35], False),
    "35+": ([35, 36], False),
    "35++": ([35, 36, 37], False),
    "35+++*": ([35, 36, 37, 38], True),
    "7": ([7], False),
}
MALFORMED = ["x35", "35x", "35++3", "35*-40", "35-40-45", "", "*", "-5", "35 36"]
# well-formed but REVERSED ranges: the regex matches, but the index set is
# empty (reference state machine / DuckDB generate_series both yield
# nothing) — the operator must emit zero rows, not a descending sequence
EMPTY_RANGE = ["40-35", "40-35*", "10-9"]


def test_model_cases():
    for spec, want in CASES.items():
        assert model(spec) == want, spec
    for spec in MALFORMED:
        assert model(spec) is None, spec
    for spec in EMPTY_RANGE:
        idx, _ = model(spec)
        assert idx == [], spec


def test_spark_operator_matches_model(spark):
    specs = list(CASES) + MALFORMED + EMPTY_RANGE
    df = spark.createDataFrame([(s,) for s in specs], "spec string")
    out = label_spec_indices(df).collect()
    got = {}
    for r in out:
        entry = got.setdefault(r.spec, ([], r.important))
        entry[0].append(r.idx)
        # every exploded row of a spec must carry the same flag
        assert entry[1] == r.important, r.spec
    for spec in MALFORMED:
        assert spec not in got, spec
    for spec in EMPTY_RANGE:
        assert spec not in got, spec  # empty sequence → explode drops the row
    for spec, (idx, imp) in CASES.items():
        gi, gimp = got[spec]
        assert sorted(gi) == idx and gimp == imp, spec
