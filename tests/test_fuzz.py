"""Property fuzz for the round-5 primitives. Each example runs ONE
Spark job over a whole generated batch (per-row jobs would be 100x
slower for the same coverage), so example counts stay small while
row counts per example stay large."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_spark.session import get_spark


def _spark():
    # Hypothesis wraps the whole test, so the pytest fixture isn't
    # usable per-example; get_spark returns the shared singleton.
    return get_spark(app_name="big_data_spark-tests", shuffle_partitions=8)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 12) - 1),
            st.integers(min_value=0, max_value=(1 << 12) - 1),
            st.integers(min_value=0, max_value=(1 << 12) - 1),
        ),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
@settings(max_examples=5, deadline=None)
def test_zorder_key_matches_python_spec_3d(vals):
    from big_data_spark.io.compact import zorder_key

    bits = 12

    def py_morton(t):
        out = 0
        for i, v in enumerate(t):
            for j in range(bits):
                out |= ((v >> j) & 1) << (j * len(t) + i)
        return out

    df = _spark().createDataFrame(vals, "a bigint, b bigint, c bigint")
    got = {
        (r.a, r.b, r.c): r.z
        for r in df.withColumn(
            "z", zorder_key(["a", "b", "c"], bits=bits)
        ).collect()
    }
    for t in vals:
        assert got[t] == py_morton(t), t
    # Interleaving distinct tuples is injective.
    assert len(set(got.values())) == len(vals)


@given(
    st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=150, unique=True),
    st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=150, unique=True),
)
@settings(max_examples=5, deadline=None)
def test_bloom_never_false_negative_on_random_strings(inserted, probed):
    from big_data_spark.operators.bloom import bloom_build, bloom_might_contain

    spark = _spark()
    ins = spark.createDataFrame([(s,) for s in inserted], "item string")
    b = bloom_build(ins, [], "item", m=512, k=3)
    union = spark.createDataFrame(
        [(s,) for s in set(inserted) | set(probed)], "item string"
    )
    got = {
        r.item: r.might_contain
        for r in bloom_might_contain(b, union, [], "item", m=512, k=3).collect()
    }
    for s in inserted:
        assert got[s] is True, repr(s)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters="@0123456789", blacklist_categories=("Cs",)
            ),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=150,
    )
)
@settings(max_examples=5, deadline=None)
def test_pii_redact_leaves_digitless_text_untouched(texts):
    # No digits and no '@' means no email/phone/ipv4/id match is
    # possible — redaction must be the identity.
    from big_data_spark.functions.pii import pii_redact

    df = _spark().createDataFrame([(t,) for t in texts], "t string")
    rows = df.select("t", pii_redact(F.col("t")).alias("red")).collect()
    for r in rows:
        assert r.red == r.t, repr(r.t)
