"""Sharded query serving: doc-range-partitioned actor pool.

The single-reader :class:`..index.query.QueryActor` holds the whole index;
at 10^12 docs no node can.  This module demonstrates the deployment shape:
each :class:`ShardedQueryActor` owns one slice of the PARTITION space (its
doc tables / norms / score buffer cover only pids ≡ shard (mod n)), scores
only its own docs with GLOBAL corpus statistics (df and avgdl in the
segments/stats are corpus-wide, so per-shard scores equal the unsharded
engine's exactly), and returns its local top-k; the driver (or a tiny
reduce stage) merges k-lists.  Tested rank-identical to the full reader.

Memory per actor = (n_docs / n_shards) x ~9 bytes of norms+buffer + its
share of lazily-cached segment shards — node-sized at any corpus scale by
raising n_shards.
"""

from __future__ import annotations

import heapq
from typing import List, Optional, Tuple

import numpy as np

import ray

from .epoch import IndexChangedError
from .query import IndexReader


def _caused_by_index_change(e: BaseException) -> bool:
    """True if ``e`` is (or wraps, as a RayTaskError cause chain) an
    :class:`IndexChangedError` — the signal that a concurrent writer
    replaced a file the actor's reader had pinned."""
    seen = 0
    while e is not None and seen < 8:
        if isinstance(e, IndexChangedError):
            return True
        # RayTaskError carries the remote exception as .cause; plain
        # exceptions chain via __cause__
        e = getattr(e, "cause", None) or getattr(e, "__cause__", None)
        seen += 1
    return False


class _ReopenMixin:
    """Opt-in reopen-at-latest-epoch for the driver-side services
    (r03 VERDICT #7; reference analog: scanners keep feeding Solr while
    it serves — ``README.md:36-48`` — and Solr swaps searchers on
    commit).  Epoch pinning makes every actor's reader a consistent
    point-in-time view; a delta cycle only ADDS files (invisible to the
    pin), but a compaction / full re-merge REPLACES pinned files.
    Serving stays up across writer cycles at the cost of one retried
    fan-out; bounded retries mean a writer racing every reopen attempt
    eventually surfaces the error honestly.

    Two triggers:

    - explicit :meth:`reopen` — the publisher notifies serving after a
      commit (Solr's searcher swap; the watch loop generator yields
      after each publish, which is the natural call site).  This is the
      PRIMARY path: pinned readers with warm file handles keep serving
      the old epoch consistently forever (POSIX inodes outlive the
      os.replace), so staleness need not ever surface as an error.
    - automatic — ``reopen_on_change=True`` additionally catches
      IndexChangedError from a COLD file open (an actor that outlived
      its epoch's files, e.g. after an actor restart or on shared
      storage without inode semantics), reopens every actor, and
      retries the fan-out.
    """

    _reopen = False
    _MAX_REOPENS = 3

    def reopen(self) -> None:
        """Re-pin every slice actor at the latest published epoch
        (drops caches; subsequent queries fault state back in lazily)."""
        ray.get([a.reopen.remote() for a in self.actors])

    def _with_reopen(self, fn):
        for attempt in range(self._MAX_REOPENS + 1):
            try:
                return fn()
            except Exception as e:
                if (not self._reopen or attempt == self._MAX_REOPENS
                        or not _caused_by_index_change(e)):
                    raise
                self.reopen()


class _SlicedReader(IndexReader):
    """IndexReader restricted to pids where pid % n_slices == slice_id."""

    def __init__(self, index_dir: str, slice_id: int, n_slices: int):
        self._slice_id = slice_id
        self._n_slices = n_slices
        # pid_filter loads ONLY this slice's doc tables / norms / buffers;
        # n_docs / avgdl stay GLOBAL (stats.json) so BM25 weights match the
        # unsharded engine exactly
        super().__init__(index_dir,
                         pid_filter=lambda p: p % n_slices == slice_id)

    def postings(self, term: str):
        docs, tfs = super().postings(term)
        if docs.size == 0:
            return docs, tfs
        mask = (docs >> 32) % self._n_slices == self._slice_id
        return docs[mask], tfs[mask]

    def dense_of(self, doc_ids):
        """Slice-safe mapping: a pid outside this slice would silently
        searchsorted-mismap onto a neighbour, corrupting scores."""
        pids = doc_ids >> 32
        pos = np.clip(np.searchsorted(self._pids, pids), 0,
                      max(0, self._pids.size - 1))
        if doc_ids.size and not np.array_equal(self._pids[pos], pids):
            raise ValueError("doc_id outside this reader's pid slice")
        return super().dense_of(doc_ids)

    # Only topk() applies the slice filter (it goes through the overridden
    # postings()).  The pruned / phrase / positions paths read raw blobs
    # via _decode_blocks_covering or stitch pos blobs against UNfiltered
    # tf runs — running them against a slice would silently misalign, so
    # they are explicitly unsupported here (ADVICE r01).
    def topk_pruned(self, query: str, k: int = 10):
        raise NotImplementedError(
            "_SlicedReader supports exhaustive topk() only; block-max "
            "pruning reads raw blobs that bypass the slice mask")

    def phrase_topk(self, query: str, k: int = 10):
        raise NotImplementedError(
            "_SlicedReader supports exhaustive topk() only; position blobs "
            "would misalign against slice-masked tf runs")

    def positions(self, term: str):
        raise NotImplementedError(
            "_SlicedReader supports exhaustive topk() only; position blobs "
            "would misalign against slice-masked tf runs")


@ray.remote
class ShardedQueryActor:
    def __init__(self, index_dir: str, slice_id: int, n_slices: int):
        self._args = (index_dir, slice_id, n_slices)
        self.reader = _SlicedReader(index_dir, slice_id, n_slices)

    def reopen(self) -> None:
        """Re-pin at the index's LATEST published epoch (drops every
        cached table; the next queries fault pages back in lazily)."""
        self.reader = _SlicedReader(*self._args)

    def topk(self, query: str, k: int) -> List[Tuple[int, float]]:
        return self.reader.topk(query, k)

    def topk_batch(self, queries: List[Tuple[str, int]]
                   ) -> List[List[Tuple[int, float]]]:
        return [self.reader.topk(q, k) for q, k in queries]


@ray.remote
class SliceQueryActor:
    """Actor over a REPARTITIONED slice index
    (:func:`..repartition.repartition_for_serving`): a plain IndexReader —
    the slice's segments hold only its docs but GLOBAL df/stats, so every
    query mode (pruned, phrase, positions) works per slice with scores
    identical to the global reader."""

    def __init__(self, slice_dir: str):
        from .query import IndexReader
        self._dir = slice_dir
        self.reader = IndexReader(slice_dir)

    def reopen(self) -> None:
        from .query import IndexReader
        self.reader = IndexReader(self._dir)

    def topk(self, query: str, k: int) -> List[Tuple[int, float]]:
        return self.reader.topk_pruned(query, k)

    def topk_batch(self, queries: List[Tuple[str, int]]
                   ) -> List[List[Tuple[int, float]]]:
        return [self.reader.topk_pruned(q, k) for q, k in queries]

    def phrase_topk(self, query: str, k: int) -> List[Tuple[int, float]]:
        return self.reader.phrase_topk(query, k)


class ShardedQueryService(_ReopenMixin):
    """Driver-side handle: fan a query to all slice actors, merge top-k.

    Two modes: ``index_dir`` (mask-based slices over one global index —
    exhaustive topk only) or ``slice_dirs`` (repartitioned per-slice
    indexes — full feature set incl. block-max pruning and phrase).
    ``reopen_on_change=True``: on IndexChangedError from any slice,
    reopen every actor at the latest epoch and retry (serve across
    writer cycles — see :class:`_ReopenMixin`)."""

    def __init__(self, index_dir: str = None, n_slices: int = 4,
                 slice_dirs: Optional[List[str]] = None,
                 reopen_on_change: bool = False):
        if slice_dirs is not None:
            self.actors = [SliceQueryActor.remote(d) for d in slice_dirs]
            self._phrase_ok = True
        else:
            self.actors = [ShardedQueryActor.remote(index_dir, s, n_slices)
                           for s in range(n_slices)]
            self._phrase_ok = False
        self._reopen = reopen_on_change

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        partials = self._with_reopen(lambda: ray.get(
            [a.topk.remote(query, k) for a in self.actors]))
        merged = heapq.merge(*[iter(p) for p in partials],
                             key=lambda h: (-h[1], h[0]))
        return list(merged)[:k]

    def topk_many(self, queries: List[Tuple[str, int]]
                  ) -> List[List[Tuple[int, float]]]:
        """Throughput path: ONE RPC per actor for the whole query batch
        (vs one fan-out round trip per query in :meth:`topk`) — all
        actors score the full batch concurrently, the driver merges each
        query's k-lists.  This is how a real client drives sharded
        serving; sequential topk() measures LATENCY, this measures
        THROUGHPUT."""
        per_actor = self._with_reopen(lambda: ray.get(
            [a.topk_batch.remote(queries) for a in self.actors]))
        out = []
        for qi, (_, k) in enumerate(queries):
            merged = heapq.merge(*[iter(p[qi]) for p in per_actor],
                                 key=lambda h: (-h[1], h[0]))
            out.append(list(merged)[:k])
        return out

    def phrase_topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        if not self._phrase_ok:
            raise NotImplementedError(
                "phrase serving needs repartitioned slice dirs")
        partials = self._with_reopen(lambda: ray.get(
            [a.phrase_topk.remote(query, k) for a in self.actors]))
        merged = heapq.merge(*[iter(p) for p in partials],
                             key=lambda h: (-h[1], h[0]))
        return list(merged)[:k]

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


@ray.remote
class BM25FSliceActor:
    """One doc-range slice of a BM25F field family (mask-based slices of
    each field index — the fields share one pid space, so slicing every
    field with the same (slice_id, n_slices) keeps them aligned)."""

    def __init__(self, field_dirs, slice_id: int, n_slices: int):
        from .bm25f import BM25FReader
        self._args = (field_dirs, (slice_id, n_slices))
        self.reader = BM25FReader(field_dirs,
                                  slice_of=(slice_id, n_slices))

    def reopen(self) -> None:
        from .bm25f import BM25FReader
        self.reader = BM25FReader(self._args[0], slice_of=self._args[1])

    def df_counts(self, terms: List[str]):
        return self.reader.term_union_df(terms)

    def topk(self, query: str, k: int, dfs) -> List[Tuple[int, float]]:
        return self.reader.topk(query, k, df_override=dfs)


class BM25FShardedService(_ReopenMixin):
    """Driver-side BM25F sharded serving with EXACT score parity.

    BM25F's idf needs the global any-field df, which no single slice
    holds; slices' per-term union counts are disjoint-space partials
    that SUM to it exactly, so serving is the classic two-phase
    distributed-search protocol: RPC 1 gathers df partials from every
    slice (one round trip for all of a query's terms), RPC 2 scores
    with the summed global dfs; the driver heap-merges per-slice
    k-lists.  Rank-identical to the unsharded ``BM25FReader`` (pinned
    in tests/test_bm25f.py)."""

    def __init__(self, field_dirs=None, n_slices: int = 4,
                 field_slice_dirs=None, reopen_on_change: bool = False):
        """``field_dirs``: mask-based slices over the global field
        indexes.  ``field_slice_dirs`` (list over slices of
        {field: slice_dir}, from ``repartition_bm25f_for_serving``):
        self-contained per-slice field indexes — the deployment shape
        where each node holds only its slice's files.
        ``reopen_on_change``: see :class:`_ReopenMixin`."""
        if (field_dirs is None) == (field_slice_dirs is None):
            raise ValueError("pass exactly one of field_dirs / "
                             "field_slice_dirs")
        if field_slice_dirs is not None:
            self.actors = [BM25FSliceDirActor.remote(d)
                           for d in field_slice_dirs]
            any_dir = next(iter(field_slice_dirs[0].values()))
        else:
            self.actors = [BM25FSliceActor.remote(field_dirs, s, n_slices)
                           for s in range(n_slices)]
            any_dir = next(iter(field_dirs.values()))
        self._reopen = reopen_on_change
        # tokenizer for the df round: all fields share one (stats.json);
        # schema-driven analyzers re-register from the persisted config
        # (same open-in-any-process contract as IndexReader)
        import json
        import os
        with open(os.path.join(any_dir, "stats.json")) as f:
            stats = json.load(f)
        if stats.get("analyzer_config") is not None:
            from ..tokenize.analyzer import ensure_registered
            ensure_registered(stats["tokenizer"],
                              stats["analyzer_config"])
        from ..tokenize.tokenizer import TOKENIZERS
        self.tokenizer = TOKENIZERS[stats["tokenizer"]]

    def _global_dfs(self, terms: List[str]):
        partials = ray.get([a.df_counts.remote(terms)
                            for a in self.actors])
        return {t: sum(p[t] for p in partials) for t in terms}

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        from .bm25 import dedup_keep_order
        terms = dedup_keep_order(self.tokenizer(query))

        def both_rounds():
            # df gather + score are retried TOGETHER: a reopen between
            # them would score with the previous epoch's global dfs
            dfs = self._global_dfs(terms)
            return ray.get([a.topk.remote(query, k, dfs)
                            for a in self.actors])

        partials = self._with_reopen(both_rounds)
        merged = heapq.merge(*[iter(p) for p in partials],
                             key=lambda h: (-h[1], h[0]))
        return list(merged)[:k]

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


@ray.remote
class BM25FSliceDirActor:
    """Actor over one REPARTITIONED slice of a BM25F field family
    (``repartition.repartition_bm25f_for_serving``): plain per-field
    IndexReaders over self-contained slice indexes — no postings
    masking needed; global df still arrives via the service's
    df-gather round (any-field union df is not stored per field)."""

    def __init__(self, field_dirs):
        from .bm25f import BM25FReader
        self._dirs = field_dirs
        self.reader = BM25FReader(field_dirs)

    def reopen(self) -> None:
        from .bm25f import BM25FReader
        self.reader = BM25FReader(self._dirs)

    def df_counts(self, terms: List[str]):
        return self.reader.term_union_df(terms)

    def topk(self, query: str, k: int, dfs) -> List[Tuple[int, float]]:
        return self.reader.topk(query, k, df_override=dfs)
