"""Near-duplicate detection on the phash column — banded self-join.

LSH over Hamming space: split the 64-bit phash into 8 disjoint 8-bit
bands; two images at Hamming distance ≤ 7 are guaranteed to agree on
at least one band (pigeonhole), so the band equi-join generates a
complete candidate set for threshold ≤ 7 with NO quadratic blowup; the
exact `bit_count(a ^ b) <= t` filter confirms.

Scale notes (north_rule "salted repartitioning for phash/format skew"):
monochrome/flat corpora concentrate phashes into few band values → the
band join skews. The suite repartitions candidates on (band_idx,
band_val) and relies on AQE skew-join as backstop; a hot-band cap
(drop band buckets above a count threshold, catching those pairs via
the remaining 7 bands) is the 10^12 safety valve — noted here, applied
when bucket stats demand it.

Reference analogue: the pictogram-membership check (SURVEY §2.8 I11)
replaced with deterministic perceptual hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pqc.constraints import SuiteContext, as_violation

HAMMING_MAX = 6
N_BANDS = 8
BAND_BITS = 8

NAME = f"near_dup:phash_hamming<={HAMMING_MAX}"


def candidate_pairs(images: DataFrame) -> DataFrame:
    """(seq_a, image_id_a, seq_b, image_id_b, hamming) confirmed pairs.

    Ordering key is ``seq`` (generation/ingest order); the keeper is
    the lower seq, mirroring first-wins dedupe
    (`artwork_processing_warnings_advisory.py:240-249`).
    """
    base = images.select("seq", "image_id", "part", "phash").filter(
        F.col("phash").isNotNull()
    )
    bands = base.select(
        "seq",
        "image_id",
        "part",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(f"(phash >> {b * BAND_BITS}) & 255").alias("band_val"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("seq", "image_id", "part", "phash", "band.band_idx", "band.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.seq") < F.col("b.seq")),
        )
        .select(
            F.col("a.seq").alias("seq_a"),
            F.col("a.image_id").alias("image_id_a"),
            F.col("b.seq").alias("seq_b"),
            F.col("b.image_id").alias("image_id_b"),
            F.col("b.part").alias("part_b"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .dropDuplicates(["seq_a", "seq_b"])
    )
    return pairs


def violations(ctx: SuiteContext) -> DataFrame:
    pairs = candidate_pairs(ctx.meta())
    return pairs.select(
        F.col("image_id_b").alias("image_id"),
        F.col("part_b").alias("part"),
        F.lit(NAME).alias("constraint"),
        F.concat(
            F.lit("near-dup of "),
            F.col("image_id_a"),
            F.lit(" hamming="),
            F.col("hamming").cast("string"),
        ).alias("detail"),
    )
