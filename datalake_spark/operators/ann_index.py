"""Standing IVF-PQ serving index under the catalog commit protocol.

The one-call operators (similarity.ivfpq_topk) rebuild the whole index
per query — fine for a gate check, wrong for serving: at scale the index
is a STANDING artifact (Jégou et al. 2011 §V; the layout every
billion-vector ANN system persists).  :class:`IvfPqIndex` makes it one,
with the same durability story as the catalog's tables (the reference's
conditional-put discipline, ingester/datalake_ingester/storage.py:64-137):

- ``build(candidates)`` trains the coarse centroids (ivf_index_build)
  and the PQ codebooks (pq_train, Lloyd-trained), encodes the corpus to
  cell-tagged codes, writes everything under a fresh version dir, and
  commits via the marker-CAS protocol (catalog._commit_version:
  ``_commits/v{N}`` PUT-if-absent is the authority, ``_CURRENT`` a
  cache) — a crash anywhere before the marker leaves the index in its
  prior state (orphan dirs only; no torn index is ever observable).
- ``append(batch, epoch)`` encodes NEW vectors against the STANDING
  centroids/codebooks (never retrains — the property that keeps every
  epoch's codes comparable) and writes them as
  ``codes/epoch=E/cent_id=*/`` inside the current version dir, then
  commits a new manifest version whose ``epochs`` list includes E.
  Epoch-keyed overwrite writes + the committed-epochs list make replays
  idempotent (the streaming/semantic.py discipline): a crash before the
  commit re-runs the identical deterministic encode and overwrites the
  same objects; a replay after the commit is a no-op.  Vectors already
  indexed under an EARLIER committed epoch are anti-joined out (the
  at-least-once re-delivery guard — a duplicate c_id would appear twice
  in every probe of its cell).
- ``search(queries)`` loads the manifest, reads ONLY committed epochs
  (uncommitted crash-orphan epoch dirs are invisible — partition-pruned
  out by the epoch filter), and runs similarity.ivfpq_search: the
  broadcast cell-probe join prunes the parquet read to
  nprobe/num_centroids of the compressed index.

Readers never lock; concurrent appenders serialize on the version
marker (losers re-resolve the manifest and retry, re-encoding if a
rebuild swapped the version dir).  Model geometry (m/ksub/
num_centroids) lives IN the manifest, so a reopened handle serves with
the parameters the index was built with, not its constructor defaults.

At 100 TB: the per-append cost is O(|batch| · (num_centroids + m·ksub)
· dim) map work + one shuffle of m rows per vector; the standing corpus
is never re-read (the prior-ids guard reads the one-row-per-vector
``ids`` tree, not the m-rows-per-vector codes).  Search reads
nprobe/num_centroids of the code files and never touches a raw vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_spark.catalog import (
    CommitConflict,
    _commit_version,
    _new_version_dir,
    _read_manifest,
)
from datalake_spark.operators.similarity import (
    ivf_assign_cells,
    ivf_index_build,
    ivfpq_search,
    pq_encode,
    pq_train,
)
from datalake_spark.store import ObjectStore, join_key, open_store


class IndexNotBuilt(Exception):
    pass


class IndexAlreadyBuilt(Exception):
    pass


class IvfPqIndex:
    """A standing IVF-PQ index rooted at ``root`` (any ObjectStore URL).

    Layout (all inside the manifest's current version dir):

    - ``centroids/``  — (cent_id, cent_vec), num_centroids rows
    - ``codebooks/``  — (sub, code, cb_micro), m·ksub rows
    - ``codes/epoch=E/cent_id=*/`` — (c_id, sub, code), m rows/vector
    - ``ids/epoch=E/`` — (c_id), 1 row/vector (the cheap prior-ids set)

    plus the commit-protocol control plane at the root: ``_commits/v*``
    markers and the ``_CURRENT`` manifest cache."""

    CENTS = "centroids"
    CB = "codebooks"
    CODES = "codes"
    IDS = "ids"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_centroids: int = 16,
        m: int = 8,
        ksub: int = 16,
        train_iters: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        store: ObjectStore | None = None,
        residual: bool = False,
    ):
        self.spark = spark
        self.store = store if store is not None else open_store(root)
        self.num_centroids = num_centroids
        self.m = m
        self.ksub = ksub
        self.train_iters = train_iters
        self.id_col = id_col
        self.vec_col = vec_col
        # IVFADC residual layout (similarity.pq_encode centroids= /
        # ivfpq_search residual=True).  Like m/ksub, the committed
        # manifest is the authority once built — a reopened handle
        # serves with the layout the index was written in.
        self.residual = residual

    # -- plumbing --------------------------------------------------------

    def _url(self, *parts: str) -> str:
        return self.store.spark_url(join_key(*parts))

    def manifest(self) -> dict | None:
        """The committed index state (marker log is the authority), or
        None when the index has never been built."""
        return _read_manifest(self.store, "")

    def _read_model(self, m: dict) -> tuple[DataFrame, DataFrame]:
        vdir = m["dir"]
        cents = self.spark.read.parquet(self._url(vdir, self.CENTS))
        cb = self.spark.read.parquet(self._url(vdir, self.CB))
        return cents, cb

    # -- lifecycle -------------------------------------------------------

    def build(self, candidates: DataFrame) -> dict:
        """Train + encode + commit version 1 (epoch 0).  Exactly one of
        N racing builders wins the v1 marker; losers get CommitConflict
        and should reopen the winner's index."""
        if self.manifest() is not None:
            raise IndexAlreadyBuilt(self.store.url)
        vdir = _new_version_dir(1)
        frames: list = []
        cents, assign = ivf_index_build(
            candidates, self.num_centroids,
            id_col=self.id_col, vec_col=self.vec_col,
        )
        cells = assign.select("c_id", "cent_id")
        rcents = cents if self.residual else None
        cb = pq_train(
            candidates, m=self.m, ksub=self.ksub, iters=self.train_iters,
            id_col=self.id_col, vec_col=self.vec_col, frames_out=frames,
            cells=cells if self.residual else None, centroids=rcents,
        )
        codes = pq_encode(
            candidates, cb, m=self.m,
            id_col=self.id_col, vec_col=self.vec_col, cells=cells,
            centroids=rcents,
        )
        cents.write.mode("overwrite").parquet(self._url(vdir, self.CENTS))
        cb.write.mode("overwrite").parquet(self._url(vdir, self.CB))
        codes.write.mode("overwrite").partitionBy("cent_id").parquet(
            self._url(vdir, self.CODES, "epoch=0")
        )
        cells.select("c_id").write.mode("overwrite").parquet(
            self._url(vdir, self.IDS, "epoch=0")
        )
        for f in frames:
            f.unpersist()
        return _commit_version(
            self.store, "", 1, vdir, prev=None,
            extra={
                "epochs": [0],
                "m": self.m,
                "ksub": self.ksub,
                "num_centroids": self.num_centroids,
                "residual": self.residual,
            },
        )

    def append(self, batch: DataFrame, epoch: int, _race_hook=None) -> dict:
        """Encode ``batch`` against the standing model as ``epoch`` and
        commit.  Idempotent per epoch: an already-committed epoch
        returns immediately (post-commit replay), an uncommitted one is
        rewritten in place (pre-commit crash replay — deterministic
        encode, same bytes).  CommitConflict retries re-resolve the
        manifest, so a concurrent appender (or a rebuild that swapped
        the version dir) just costs this appender a re-encode."""
        batch = batch.select(
            F.col(self.id_col).alias(self.id_col),
            F.col(self.vec_col).alias(self.vec_col),
        )
        last: Exception | None = None
        for _ in range(5):
            m = self.manifest()
            if m is None:
                raise IndexNotBuilt(self.store.url)
            if epoch in m["epochs"]:
                return m  # post-commit replay: the epoch is already served
            vdir = m["dir"]
            cents, cb = self._read_model(m)
            # at-least-once re-delivery guard: ids already committed
            # under EARLIER epochs leave the batch (ids tree is one row
            # per vector — the codes tree, m rows per vector, is never
            # read here).  The epoch filter also hides crash-orphan
            # uncommitted epoch dirs, whose vectors must NOT count as
            # indexed (they are invisible to search too).
            prior = (
                self.spark.read.parquet(self._url(vdir, self.IDS))
                .filter(F.col("epoch").isin([int(e) for e in m["epochs"]]))
                .select("c_id")
            )
            new = batch.join(
                prior, F.col(self.id_col) == F.col("c_id"), "left_anti"
            )
            cells = ivf_assign_cells(
                new, cents, id_col=self.id_col, vec_col=self.vec_col
            )
            codes = pq_encode(
                new, cb, m=int(m["m"]),
                id_col=self.id_col, vec_col=self.vec_col, cells=cells,
                # manifest, not constructor: appended codes must use the
                # layout the index was BUILT with
                centroids=cents if m.get("residual") else None,
            )
            codes.write.mode("overwrite").partitionBy("cent_id").parquet(
                self._url(vdir, self.CODES, f"epoch={epoch}")
            )
            cells.select("c_id").write.mode("overwrite").parquet(
                self._url(vdir, self.IDS, f"epoch={epoch}")
            )
            if _race_hook is not None:
                _race_hook()
            try:
                return _commit_version(
                    self.store, "", m["version"] + 1, vdir, prev=m,
                    extra={
                        "epochs": [int(e) for e in m["epochs"]] + [epoch],
                        "m": m["m"],
                        "ksub": m["ksub"],
                        "num_centroids": m["num_centroids"],
                        "residual": bool(m.get("residual", False)),
                    },
                )
            except CommitConflict as e:
                last = e  # re-resolve and retry
        raise last  # type: ignore[misc]

    def search(
        self, queries: DataFrame, k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """ivfpq_search over the committed index: reads the manifest's
        version dir, filters codes to COMMITTED epochs (crash-orphan
        epoch dirs are pruned out at plan time), probes nprobe cells."""
        m = self.manifest()
        if m is None:
            raise IndexNotBuilt(self.store.url)
        vdir = m["dir"]
        cents, cb = self._read_model(m)
        codes = (
            self.spark.read.parquet(self._url(vdir, self.CODES))
            .filter(F.col("epoch").isin([int(e) for e in m["epochs"]]))
            .select("c_id", "sub", "code", "cent_id")
        )
        return ivfpq_search(
            cents, cb, codes, queries, k=k, nprobe=nprobe, m=int(m["m"]),
            id_col=self.id_col, vec_col=self.vec_col,
            residual=bool(m.get("residual", False)),
        )

    # -- streaming maintenance -------------------------------------------

    def start_stream(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        available_now: bool = True,
        trigger_interval: str | None = None,
    ):
        """Maintain the index from a stream of embedding events (the
        streaming/semantic.py landing-dir shape): every micro-batch
        appends as index epoch ``streaming_epoch + 1`` (build holds
        epoch 0).  One checkpoint dir per index lifetime — the streaming
        epoch counter is what keys the idempotent replays, so pointing a
        FRESH checkpoint at an index that already ingested epochs would
        silently skip them (the same contract streaming/semantic.py
        documents)."""
        from datalake_spark.streaming.semantic import vec_stream

        def _sink(batch: DataFrame, epoch: int) -> None:
            self.append(batch, epoch + 1)

        writer = (
            vec_stream(self.spark, landing_dir)
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval is not None:
            writer = writer.trigger(processingTime=trigger_interval)
        return writer.start()
