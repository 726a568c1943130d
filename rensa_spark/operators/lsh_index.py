"""Persistent LSH index as a table — the RMinHashLSH API surface
(/root/reference/src/lsh/, SURVEY.md §2.4) re-expressed over a bands table.

The reference's in-memory ``Vec<HashMap<band_hash, Vec<key>>>`` becomes a
(key, band_idx, band_hash) table; each method is one DataFrame op:

| reference (src/lsh/py.rs)          | here                             |
|------------------------------------|----------------------------------|
| insert / insert_pairs / insert_many| ``insert`` (append band rows)    |
| remove(key)                        | ``remove`` (anti-join rewrite;   |
|                                    | DELETE FROM on Iceberg)          |
| query(minhash)                     | ``query`` (band equi-join +      |
|                                    | collect_set)                     |
| query_all                          | same join, grouped per query key |
| query_duplicate_flags              | ``query_duplicate_flags``        |
| insert_matrix_and_query_duplicate_flags / one-shot | ``one_shot_flags`` (matrix-vs-matrix + matrix-vs-index) |
| is_similar(m1, m2)                 | jaccard expression (operators.dedup) |

State lives in ``state_dir`` as parquet (Iceberg MERGE/DELETE on a real
deployment); signatures are stored alongside for jaccard verification.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rensa_spark.config import RensaConfig


class LshIndex:
    def __init__(self, spark: SparkSession, cfg: RensaConfig, state_dir: str) -> None:
        if not (0.0 <= cfg.threshold <= 1.0):
            raise ValueError("threshold must be in [0, 1]")
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _exists(self) -> bool:
        return os.path.exists(os.path.join(self._path("bands"), "_SUCCESS"))

    def bands(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame(
                [], "key string, band_idx int, band_hash long"
            )
        return self.spark.read.parquet(self._path("bands"))

    def is_empty(self) -> bool:
        return not self._exists() or not self.bands().take(1)

    def len(self) -> int:
        if not self._exists():
            return 0
        return (
            self.bands().select("key").distinct().count()
        )

    def insert(self, df: DataFrame, cfg_key: str = "key", text_col: str = "text") -> None:
        """Sketch + band rows appended to the index (insert_matrix,
        src/lsh/py.rs:94-108). Re-insert semantics (remove old first,
        src/lsh/index.rs:145-165): remove keys that already exist."""
        from rensa_spark.operators.sketch import rminhash_band_rows

        new_bands = rminhash_band_rows(
            df.select(F.col(cfg_key).alias("key"), F.col(text_col).alias("text")),
            self.cfg,
            "key",
            "text",
        )
        if self._exists():
            keys = df.select(F.col(cfg_key).alias("key")).distinct()
            kept = self.bands().join(keys, "key", "left_anti")
            merged = kept.unionByName(new_bands)
            # rewrite (Iceberg: MERGE INTO)
            merged.write.mode("overwrite").parquet(self._path("bands_tmp"))
            self.spark.read.parquet(self._path("bands_tmp")).write.mode(
                "overwrite"
            ).parquet(self._path("bands"))
        else:
            new_bands.write.mode("overwrite").parquet(self._path("bands"))

    def remove(self, keys_df: DataFrame, key_col: str = "key") -> None:
        """DELETE FROM bands WHERE key IN (...) (src/lsh/py.rs:169-176)."""
        if not self._exists():
            return
        kept = self.bands().join(
            keys_df.select(F.col(key_col).alias("key")).distinct(), "key", "left_anti"
        )
        kept.write.mode("overwrite").parquet(self._path("bands_tmp"))
        self.spark.read.parquet(self._path("bands_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("bands"))

    def query(self, df: DataFrame, key_col: str = "key", text_col: str = "text") -> DataFrame:
        """Per query row: distinct index keys sharing >=1 band
        (query/query_all, src/lsh/index.rs:100-121) ->
        (key, candidates array<string>)."""
        from rensa_spark.operators.sketch import rminhash_band_rows

        qbands = rminhash_band_rows(
            df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text")),
            self.cfg,
            "key",
            "text",
        )
        hits = (
            qbands.join(
                self.bands().withColumnRenamed("key", "index_key"),
                ["band_idx", "band_hash"],
            )
            .groupBy("key")
            .agg(F.sort_array(F.collect_set("index_key")).alias("candidates"))
        )
        return (
            df.select(F.col(key_col).alias("key"))
            .join(hits, "key", "left")
            .withColumn(
                "candidates",
                F.coalesce("candidates", F.array().cast("array<string>")),
            )
        )

    def query_duplicate_flags(
        self, df: DataFrame, key_col: str = "key", text_col: str = "text"
    ) -> DataFrame:
        """flag = more than 1 distinct candidate (len(query) > 1,
        src/lsh/index.rs:123-143) -> (key, is_dup)."""
        return self.query(df, key_col, text_col).select(
            "key", (F.size("candidates") > 1).alias("is_dup")
        )

    def one_shot_flags(
        self, df: DataFrame, key_col: str = "key", text_col: str = "text"
    ) -> DataFrame:
        """query_duplicate_flags_matrix_one_shot with a non-empty index
        (src/lsh/one_shot.rs:294-332): flag = shares a band bucket with
        another query row OR with any index entry. Does not insert."""
        from rensa_spark.operators.lsh import one_shot_flags_from_bands
        from rensa_spark.operators.sketch import rminhash_band_rows

        qbands = rminhash_band_rows(
            df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text")),
            self.cfg,
            "key",
            "text",
        ).persist()
        intra = one_shot_flags_from_bands(qbands)
        vs_index = (
            qbands.join(self.bands().select("band_idx", "band_hash").distinct(),
                        ["band_idx", "band_hash"], "leftsemi")
            .select("key")
            .distinct()
            .withColumn("hit_index", F.lit(True))
        )
        return (
            intra.join(vs_index, "key", "left")
            .select(
                "key",
                (F.col("is_dup") | F.coalesce("hit_index", F.lit(False))).alias(
                    "is_dup"
                ),
            )
        )
