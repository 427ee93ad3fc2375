"""End-to-end corpus curation: the composition a training-data pipeline
actually runs over 100 TB of raw documents —

    quality filter → language filter → exact dedup → near-dup
    cluster dedup → split assignment

producing (a) a per-document manifest (keep/drop + stage + cluster +
split — the artifact downstream training jobs consume) and (b) the
stage funnel (docs surviving each stage — the monitoring artifact).

Every stage is one of the already-oracle-checked operators from
text.py / dedup.py / components.py; this module only composes them, in
the order that minimizes work at scale: cheap scan-speed filters first
(quality, language — pure JVM expressions), the shuffling stages
(fingerprint groupBy, n-gram self-join, connected components) only
over survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import components as CC
from . import dedup as DD
from . import text as TX


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    keep_langs: tuple = ("en", "de", "fr"),
    min_tokens: int = 20,
    max_dup_word_frac: float = 0.6,
    jaccard_threshold: float = 0.5,
    ngram_df_cap: int = 64,
    train: float = 0.8,
    val: float = 0.1,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel. Returns (manifest, funnel):

    manifest: one row per input doc — (id, keep BOOLEAN, drop_stage
    STRING or NULL, cluster_id BIGINT or NULL, split STRING or NULL).
    funnel: (stage STRING, n_docs BIGINT) — docs surviving each stage,
    plus one `split:*` row per split among the final keep set.

    Near-dup blocking uses (lang, length-bucket) with the same df-cap
    as doc_ngram_jaccard; cluster representative = min doc id."""
    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
    )
    toks = base.select(
        "id", "lang", "text", TX.tokens("text").alias("w")
    )
    flagged = toks.select(
        "id",
        "lang",
        "text",
        (
            (F.size("w") >= min_tokens)
            & (TX.dup_word_fraction(F.col("w")) <= max_dup_word_frac)
        ).alias("q_ok"),
        F.col("lang").isin(*keep_langs).alias("l_ok"),
    )
    quality = flagged.filter(F.col("q_ok"))
    lang_ok = quality.filter(F.col("l_ok"))

    # exact dedup: keep the min id per normalized-md5 fingerprint
    fp = lang_ok.withColumn("fp", TX.fingerprint("text"))
    exact = fp.withColumn(
        "rep", F.min("id").over(Window.partitionBy("fp"))
    )
    exact_keep = exact.filter(F.col("id") == F.col("rep")).select(
        "id", "lang", "text"
    )

    # near-dup clusters over exact survivors: n-gram Jaccard pairs →
    # connected components → keep the cluster representative (min id)
    survivors = exact_keep.withColumn(
        "lb", (F.length("text") / 100).cast("long")
    )
    pairs = DD.ngram_jaccard_pairs_exploded(
        survivors,
        id_col="id",
        text_col="text",
        n=3,
        threshold=jaccard_threshold,
        block_cols=("lang", "lb"),
        max_gram_df=ngram_df_cap,
    ).select("id_a", "id_b")
    comp = CC.connected_components(pairs, src="id_a", dst="id_b")
    clustered = exact_keep.join(
        comp, exact_keep["id"] == comp["node"], "left"
    ).select(
        "id",
        F.coalesce("component", exact_keep["id"]).alias("cluster_id"),
    )
    near_keep = clustered.filter(F.col("id") == F.col("cluster_id"))

    final = near_keep.withColumn(
        "split", TX.split_assign(F.col("id"), train=train, val=val)
    )

    # ------------------------------------------------------- manifest
    manifest = (
        flagged.select("id", "q_ok", "l_ok")
        .join(exact.select("id", F.lit(True).alias("e_in"),
                           (F.col("id") == F.col("rep")).alias("e_keep")),
              "id", "left")
        .join(clustered.select("id", "cluster_id"), "id", "left")
        .join(final.select("id", "split"), "id", "left")
        .select(
            "id",
            F.col("split").isNotNull().alias("keep"),
            F.when(~F.col("q_ok"), F.lit("quality"))
            .when(~F.col("l_ok"), F.lit("language"))
            .when(~F.coalesce("e_keep", F.lit(False)), F.lit("exact_dup"))
            .when(F.col("split").isNull(), F.lit("near_dup"))
            .alias("drop_stage"),
            "cluster_id",
            "split",
        )
    )

    # --------------------------------------------------------- funnel
    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    funnel = (
        stage("0_raw", base)
        .union(stage("1_quality", quality))
        .union(stage("2_language", lang_ok))
        .union(stage("3_exact_dedup", exact_keep))
        .union(stage("4_near_dup", near_keep))
        .union(
            final.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(F.concat(F.lit("5_split:"), F.col("split")).alias("stage"),
                    "n_docs")
        )
    )
    return manifest, funnel
