"""Bloom filter as a pure DataFrame composition — the membership
member of the sketch family (HLL distinct counts in operators/hll.py,
CMS frequencies in operators/cms.py).

The filter is a plain DataFrame of (key..., word, bits, m, k): the
``m``-bit array is stored as 64-bit words (``word`` = bit index // 64,
``bits`` = OR of the set bits in that word), built with ``k`` hash
functions ``xxhash64(item, hash_index) mod m``. That representation
is:

- **mergeable**: union + per-(key, word) ``bit_or`` is the EXACT
  bitwise-OR merge, so per-batch filters roll up across days/streams
  without raw data — filter(union) == merge(filters), row for row;
- **persistable**: write it to parquet like any table;
- **sparse**: only words with at least one set bit are stored, so a
  lightly-loaded filter costs far fewer than m/64 rows;
- **cheap**: one map-side-combinable shuffle of (key, word) pairs —
  k rows per item, at most ceil(m/64) rows per key retained.

Probes have the one-sided guarantee: an inserted item ALWAYS probes
true (no false negatives — the property dedup/decontamination
pipelines rely on: a "seen" verdict may be double-checked, a
"not seen" verdict is final); an absent item probes true with
probability ~(1 - e^(-k*n/m))^k (``bloom_fpp``).

Parameter safety: probing with (m, k) different from the filter's
silently breaks the no-false-negative guarantee (wrong m re-buckets
the probe bits, which then miss), so ``bloom_might_contain`` asserts
the probe's (m, k) against the filter's embedded columns JVM-side —
the query FAILS loudly instead — and ``bloom_merge`` groups by
(m, k) so mixed-parameter input can never silently OR together.

The 100 TB shape: build per-partition filters of a reference corpus
(benchmark sets, already-ingested shards), persist them, roll them
up, then anti-join a new batch through ``bloom_might_contain`` —
the filter side is at most ceil(m/64) rows per key, so it broadcasts
and the probe batch never shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RESERVED = ("word", "bits", "m", "k")


def _probe_rows(item_col: str, m: int, k: int) -> F.Column:
    """Exploded (word, bit) positions for one item: k seeded xxhash64
    bit indices into the m-bit array."""
    pos = [
        F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(m)) for i in range(k)
    ]
    # word/bit split via shift+mask — pure integer ops, no float round
    # trip (pos is in [0, m), m a Python int, so bigints stay exact).
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.shiftright(p.cast("int"), 6).alias("word"),
                    p.cast("int").bitwiseAND(F.lit(63)).alias("bit"),
                )
                for p in pos
            ]
        )
    )


def bloom_build(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    m: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Filter table (key..., word, bits, m, k) from one pass over the
    items. NULL items are ignored (a NULL is not a value; inserting
    it would make NULL probes spuriously positive).

    Key columns may not use the reserved names {word, bits, m, k} —
    merge/probe address those by name."""
    if k < 1 or m < 64:
        raise ValueError(f"need k >= 1 hashes and m >= 64 bits, got {m=} {k=}")
    clash = set(key_cols) & set(_RESERVED)
    if clash:
        raise ValueError(
            f"key columns {sorted(clash)} collide with reserved filter columns"
        )
    df = df.where(F.col(item_col).isNotNull())
    return (
        df.select(*key_cols, _probe_rows(item_col, m, k).alias("wb"))
        .select(*key_cols, "wb.word", "wb.bit")
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .groupBy(*key_cols, "word")
        .agg(F.bit_or("mask").alias("bits"))
        # Post-agg literals: parameter provenance costs nothing in the
        # shuffle and makes mismatched probes detectable.
        .withColumn("m", F.lit(m))
        .withColumn("k", F.lit(k))
    )


def bloom_merge(*filters: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Exact merge: union + per-(key, word) bitwise OR. Mergeable
    because set bits are idempotent under OR — build(union) ==
    merge(builds), row for row.

    ``key_cols`` names the key columns explicitly; when omitted they
    are inferred as every column outside the reserved filter set
    (fine unless a key legitimately uses a reserved name — pass
    key_cols in that case). The (m, k) parameter columns stay in the
    grouping, so filters built with different parameters never OR
    together — they surface as separate (m, k) rows for
    bloom_might_contain's assertion to catch."""
    if not filters:
        raise ValueError("nothing to merge")
    out = filters[0]
    for other in filters[1:]:
        out = out.unionByName(other)
    if key_cols is None:
        key_cols = [c for c in out.columns if c not in _RESERVED]
    params = [c for c in ("m", "k") if c in out.columns]
    merged = out.groupBy(*key_cols, *params, "word").agg(
        F.bit_or("bits").alias("bits")
    )
    # Same column layout as bloom_build, so merge(filters) is row-
    # for-row comparable with build(union).
    return merged.select(*key_cols, "word", "bits", *params)


def bloom_might_contain(
    bloom: DataFrame,
    items: DataFrame,
    key_cols: list[str],
    item_col: str,
    m: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Membership probe for each (key, item) row in ``items``:
    might_contain is true iff ALL k of the item's bits are set.
    Missing words mean unset bits; NULL items are dropped (mirroring
    bloom_build — a NULL was never inserted, so probing it would
    test seed-derived positions of a value that does not exist).

    ``m``/``k`` must match the filter's; when the filter carries its
    (m, k) columns (bloom_build always emits them) the match is
    ASSERTED JVM-side and the query fails loudly on mismatch instead
    of silently returning false negatives.

    The probe joins on (key, word) — the filter side is at most
    ceil(m/64) rows per key, so for a bounded key universe it
    broadcasts and the items table never shuffles."""
    probes = (
        items.where(F.col(item_col).isNotNull())
        .select(
            *key_cols,
            F.col(item_col).alias("_item"),
            _probe_rows(item_col, m, k).alias("wb"),
        )
        .select(*key_cols, "_item", "wb.word", "wb.bit")
    )
    if "m" in bloom.columns and "k" in bloom.columns:
        # Validate on the FILTER side, pre-join: a wrong m re-buckets
        # the probe positions so mismatched rows mostly MISS the join
        # — checking joined rows would let the error through. The
        # assert is folded INTO the bits column (assert_true yields
        # NULL on success) so column pruning can never optimize it
        # away; every filter row is asserted as the join scans it.
        check = F.assert_true(
            (F.col("m") == F.lit(m)) & (F.col("k") == F.lit(k)),
            F.format_string(
                "bloom_might_contain(m=%s, k=%s) probed a filter built "
                "with (m=%s, k=%s) — false negatives would result",
                F.lit(str(m)),
                F.lit(str(k)),
                F.col("m").cast("string"),
                F.col("k").cast("string"),
            ),
        )
        bloom = bloom.select(
            *key_cols,
            "word",
            F.when(check.isNull(), F.col("bits")).alias("bits"),
        )
    joined = probes.join(bloom, on=[*key_cols, "word"], how="left")
    hit = (
        F.expr("shiftright(bits, bit)").bitwiseAND(F.lit(1)).cast("int")
    )
    return (
        joined.groupBy(*key_cols, "_item")
        .agg((F.min(F.coalesce(hit, F.lit(0))) == 1).alias("might_contain"))
        .select(*key_cols, F.col("_item").alias(item_col), "might_contain")
    )


def bloom_fpp(n_items: int, m: int = 8192, k: int = 4) -> float:
    """Theoretical false-positive probability after inserting
    ``n_items`` distinct items: (1 - e^(-k*n/m))^k."""
    return (1.0 - math.exp(-k * n_items / float(m))) ** k
