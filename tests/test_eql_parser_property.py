"""Property test: every well-formed EQL query round-trips through
parse_eql to exactly the arguments that built it (no Spark needed)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from telegram2elastic_spark.query.eql import parse_eql

_CAT = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_CMP = st.sampled_from([">=", "<=", ">", "<", "==", "!="])
_NUM = st.integers(min_value=-999, max_value=999)
_UNIT = st.sampled_from([("s", 1), ("m", 60), ("h", 3600), ("d", 86400)])
_WS = st.sampled_from(["", " ", "  "])


def _step_text(cat, pred):
    if pred is None:
        return f"[ {cat} ]"
    cmp_, num = pred
    return f"[ {cat} where value {cmp_} {num} ]"


@settings(max_examples=200, deadline=None)
@given(
    cats=st.lists(_CAT, min_size=2, max_size=3),
    preds=st.lists(st.one_of(st.none(), st.tuples(_CMP, _NUM)), min_size=3, max_size=3),
    span=st.integers(min_value=1, max_value=999),
    unit=_UNIT,
    until=st.one_of(st.none(), _CAT),
    pad=_WS,
)
def test_sequence_roundtrip(cats, preds, span, unit, until, pad):
    suffix, mult = unit
    steps_txt = " ".join(
        _step_text(c, p) for c, p in zip(cats, preds)
    )
    q = (
        f"sequence by user_id with maxspan={span}{suffix}{pad} "
        f"{steps_txt}"
    )
    if until is not None:
        q += f" until [ {until} ]"
    p = parse_eql(q)
    assert p["kind"] == "sequence"
    assert p["maxspan_sec"] == span * mult
    assert p["until"] == until
    expected_steps = [
        c if pr is None else {"type": c, "where": f"value {pr[0]} {pr[1]}"}
        for c, pr in zip(cats, preds)
    ]
    assert p["steps"] == expected_steps


@settings(max_examples=100, deadline=None)
@given(cats=st.lists(_CAT, min_size=2, max_size=4))
def test_sample_roundtrip(cats):
    q = "sample by user_id " + " ".join(f"[ {c} ]" for c in cats)
    p = parse_eql(q)
    assert p == {"kind": "sample", "categories": cats, "pipe": None}
