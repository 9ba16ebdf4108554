"""Text-rule unit tests on hand-crafted captions — the reference's own
edge cases (`banningredients.py:131-139,415`: boundary matching;
`:74-81`: mojibake; `:216-219`: exact-beats-fuzzy)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pqc.constraints import SuiteContext
from pqc.constraints.text_rules import banned_violations, screen_hits


def _ctx(spark, captions, synonyms=None):
    rows = [
        {
            "seq": i,
            "image_id": f"t{i}",
            "bytes": None,
            "w": 64,
            "h": 64,
            "fmt": "png",
            "caption": c,
            "phash": 0,
            "part": 0,
        }
        for i, c in enumerate(captions)
    ]
    images = spark.createDataFrame(pd.DataFrame(rows))
    syn = synonyms or [
        {"canonical": "tea", "e_number": "", "type": "Banned", "synonym": "tea"},
        {
            "canonical": "kava kava",
            "e_number": "",
            "type": "Banned",
            "synonym": "kava kava",
        },
        {
            "canonical": "kava kava",
            "e_number": "",
            "type": "Banned",
            "synonym": "kava-kava",
        },
        {
            "canonical": "comfrey",
            "e_number": "",
            "type": "Restricted",
            "synonym": "comfrey",
        },
    ]
    extras = {"synonyms": spark.createDataFrame(pd.DataFrame(syn))}
    return SuiteContext(images=images, extras=extras)


def test_boundary_trap_tea_not_in_stearate(spark):
    ctx = _ctx(
        spark,
        [
            "Ingredients: magnesium stearate, sugar",  # must NOT match 'tea'
            "Ingredients: green tea extract, sugar",  # must match
            "Contains TEA and water",  # case-insensitive token
        ],
    )
    hits = screen_hits(ctx).filter(F.col("canonical") == "tea").collect()
    matched_ids = sorted(h["image_id"] for h in hits)
    assert matched_ids == ["t1", "t2"]
    assert all(h["match_kind"] == "exact" for h in hits)


def test_hyphen_space_variants_unify(spark):
    ctx = _ctx(
        spark,
        ["with kava-kava root", "with kava   kava root", "with kavakava root"],
    )
    hits = (
        screen_hits(ctx)
        .filter((F.col("canonical") == "kava kava") & (F.col("match_kind") == "exact"))
        .collect()
    )
    assert sorted(h["image_id"] for h in hits) == ["t0", "t1"]


def test_mojibake_repaired_before_matching(spark):
    ctx = _ctx(spark, ["donâ€™t use comfrey daily"])
    hits = screen_hits(ctx).collect()
    assert any(h["canonical"] == "comfrey" for h in hits)
    assert all("â€" not in h["segment"] for h in hits)


def test_fuzzy_hit_flagged_needs_review(spark):
    ctx = _ctx(spark, ["contains comfrey extract", "contains comfrex extract"])
    v = banned_violations(ctx).collect()
    by_id = {r["image_id"]: r for r in v}
    # comfrey is Restricted → exact hit is needs_review, fuzzy also review
    assert by_id["t0"]["constraint"] == "text:needs_review"
    assert "exact" in by_id["t0"]["detail"]
    assert by_id["t1"]["constraint"] == "text:needs_review"
    assert "fuzzy" in by_id["t1"]["detail"]


def test_exact_banned_is_violation(spark):
    ctx = _ctx(spark, ["with kava kava inside"])
    v = banned_violations(ctx).collect()
    assert len(v) == 1
    assert v[0]["constraint"] == "text:banned_ingredient"
    assert "kava kava" in v[0]["detail"]


def test_exact_beats_fuzzy_per_canonical(spark):
    # one caption with both an exact and a near-miss mention: best
    # evidence must be the exact one (banningredients.py:216-219)
    ctx = _ctx(spark, ["tea blend, also teax flavour"])
    hits = screen_hits(ctx).filter(F.col("canonical") == "tea").collect()
    assert len(hits) == 1
    assert hits[0]["match_kind"] == "exact"


def test_novel_food_threshold_parameter(spark):
    """The slider semantics (app.py:454-456): lowering the threshold
    catches more variants; row 11 sits exactly in the 80-87 band."""
    from pqc.compliance_packs import novel_food_screen

    at87 = {(r["row_id"], r["canonical"]) for r in novel_food_screen(spark, "").collect()}
    at80 = {
        (r["row_id"], r["canonical"])
        for r in novel_food_screen(spark, "", threshold=80).collect()
    }
    assert at87 < at80
    assert all(rid != 11 for rid, _ in at87)
    assert any(rid == 11 for rid, _ in at80)


def test_address_quality_known_scores(spark):
    """Hand-computed scores against the reference arithmetic
    (artwork_processing_supplier_addresses.py:153-173)."""
    from pqc.compliance_packs import address_quality_score

    rows = {r["row_id"]: r for r in address_quality_score(spark, "").collect()}
    # note: the reference counts a <=2-word last line as "truncated"
    # (supplier_addresses.py:141-144), so "United Kingdom" endings
    # carry the -0.6 too — 9.0 - 0.6 here
    assert rows[1]["score"] == 8.4 and rows[1]["country_hint"] == "UK"
    assert rows[4]["score"] == 4.2 and rows[4]["country_hint"] == "UK"  # postcode wins
    assert rows[5]["score"] == 3.0  # truncated comma −0.6
    assert rows[6]["score"] == 0.0 and rows[7]["score"] == 0.0
    assert rows[8]["score"] == 1.0 and rows[8]["country_hint"] == "UNK"
