"""Mesh-sharded serving: the multi-chip replacement for exec_query_par.

The reference's only scale-out is thread-per-index-source fan-out with
caller-side result merging (exec.h:86-177; "no coordination" contract,
exec.h:55-62). The TPU-native equivalent (SURVEY §2.4): the docid space is
range-partitioned into shards, one per device; each device holds its shard's
HBM-resident block arrays; a query is broadcast; every device runs the same
dense tiled search on its shard under `shard_map`; per-shard top-k results
ride ICI via the all-gather implied by the sharded output, and the global
top-k merge preserves the deterministic (score desc, docid asc) order
because shards are docid-ordered ranges.

Collection-level statistics (df, docsCnt) aggregate over shards exactly like
multi-source scoring (similarity.h:209-217), so a sharded index scores
identically to the unsharded one.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import numpy as np

from trinity_tpu.index.format import SegmentData
from trinity_tpu.limits import WINDOW_SIZE
from trinity_tpu.models.similarity import SIMILARITIES
from trinity_tpu.plan.compile import compile_plan
from trinity_tpu.query.parser import Query, parse_query

NEG_INF = float("-inf")


class _StatsProxy:
    """Aggregated stats carrier for per-shard scoring (docs_cnt only)."""

    def __init__(self, docs_cnt: int):
        self.docs_cnt = docs_cnt


def split_segment(seg: SegmentData, n_shards: int) -> List[SegmentData]:
    """Range-partition a segment's local docid space into n_shards
    sub-segments (window-aligned). This is the offline shard builder; in
    production the indexer emits shards directly (segments are already the
    unit of distribution, SURVEY §5.8)."""
    from trinity_tpu.index.builder import _build_segment
    from trinity_tpu.index.format import decode_block

    W = seg.n_windows
    w_per = -(-W // n_shards)
    shards = []
    for s in range(n_shards):
        lo = s * w_per * WINDOW_SIZE
        hi = min((s + 1) * w_per * WINDOW_SIZE, seg.n_docs)
        if lo >= seg.n_docs:
            lo = hi = seg.n_docs
        keep_ids = seg.doc_map[lo:hi]
        tid_parts, doc_parts, pos_parts = [], [], []
        for tid in range(seg.n_terms):
            b0 = int(seg.term_block_start[tid])
            nb = int(seg.term_nblocks[tid])
            for b in range(b0, b0 + nb):
                if seg.block_last_doc[b] < lo or seg.block_first_doc[b] >= hi:
                    continue
                docs, freqs = decode_block(seg, b)
                h0 = int(seg.block_hits_off[b])
                pos = seg.positions[h0 : h0 + int(freqs.sum())]
                sel = (docs >= lo) & (docs < hi)
                if not sel.any():
                    continue
                hit_doc = np.repeat(docs, freqs)
                hit_sel = (hit_doc >= lo) & (hit_doc < hi)
                doc_parts.append(hit_doc[hit_sel].astype(np.int64) - lo)
                pos_parts.append(pos[hit_sel].astype(np.int64))
                tid_parts.append(np.full(int(hit_sel.sum()), tid, np.int64))
        if tid_parts:
            tid_a = np.concatenate(tid_parts)
            doc_a = np.concatenate(doc_parts)
            pos_a = np.concatenate(pos_parts)
            perm = np.lexsort((pos_a, doc_a, tid_a))
            tid_a, doc_a, pos_a = tid_a[perm], doc_a[perm], pos_a[perm]
        else:
            tid_a = doc_a = pos_a = np.zeros(0, np.int64)
        shards.append(
            _build_segment(
                keep_ids.astype(np.uint32),
                list(seg.terms),
                tid_a,
                doc_a,
                pos_a,
                None,
                seg.updated_ids,
                hi - lo,
            )
        )
    return shards


@functools.lru_cache(maxsize=256)
def _build_sharded_fn(tape, scorer_name, S, W, T, k, interpret, axis, mesh):
    """shard_map'd search: each device evaluates its shard, emits (k, k)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from trinity_tpu.exec.executor import _eval_tape
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def shard_body(bmeta, planes, cs, cn, weights, n_docs, base):
        # leading shard axis of size 1 inside the shard
        tiles = materialize_freq_tiles(
            bmeta[0],
            planes[0],
            cs[0],
            cn[0],
            n_windows=W,
            n_terms=T,
            interpret=interpret,
        )
        freq = tiles.reshape(W, T, WINDOW_SIZE)
        mask, score = _eval_tape(tape, freq, weights, scorer_cls, jnp)
        gid = (
            jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
            + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        )
        mask = mask & (gid < n_docs[0])
        scores = jnp.where(mask, score, NEG_INF)
        gv, gi = jax.lax.top_k(scores.reshape(-1), k)  # flat: docid ties
        # global docid = shard base + local id; shards are docid-ordered so
        # the final cross-shard merge keeps docid-ascending tie-breaks
        return gv[None], (gi + base[0])[None]

    def run(bmeta, planes, cs, cn, weights, n_docs, base):
        f = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,  # pallas_call inside can't declare vma yet
        )
        sv, si = f(bmeta, planes, cs, cn, weights, n_docs, base)  # (S, k)
        # cross-shard merge on one logical array (XLA all-gathers over ICI)
        flat_v = sv.reshape(-1)
        flat_i = si.reshape(-1)
        gv, gidx = jax.lax.top_k(flat_v, k)
        return gv, flat_i[gidx]

    return jax.jit(run)


class MeshExecutor:
    """Sharded search session over a device mesh (the exec_query_par
    analog). Pass segments pre-sharded by docid range (split_segment) or a
    single segment with n_shards to split."""

    def __init__(
        self,
        seg_or_shards,
        mesh=None,
        n_shards: Optional[int] = None,
        interpret: Optional[bool] = None,
        axis: str = "shards",
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from trinity_tpu.ops.postings import pack_block_meta, pad_planes

        if isinstance(seg_or_shards, SegmentData):
            n = n_shards or max(1, len(jax.devices()))
            self.shards = split_segment(seg_or_shards, n)
        else:
            self.shards = list(seg_or_shards)
        S = len(self.shards)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:S]), (axis,))
        self.mesh = mesh
        self.axis = axis
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

        # uniform per-shard geometry: pad to the max windows/blocks/rows
        self.W = max(s.n_windows for s in self.shards)
        metas = [pack_block_meta(s) for s in self.shards]
        planes = [pad_planes(s.planes) for s in self.shards]
        mrows = max(m.shape[0] for m in metas)
        prows = max(p.shape[0] for p in planes)
        metas = np.stack(
            [np.pad(m, ((0, mrows - m.shape[0]), (0, 0))) for m in metas]
        )
        planes = np.stack(
            [np.pad(p, ((0, prows - p.shape[0]), (0, 0))) for p in planes]
        )
        shard_spec = NamedSharding(mesh, P(axis))
        self.bmeta = jax.device_put(jnp.asarray(metas), shard_spec)
        self.planes = jax.device_put(jnp.asarray(planes), shard_spec)
        self.n_docs = jnp.asarray([s.n_docs for s in self.shards], jnp.int32)
        bases = np.zeros(S, np.int64)
        np.cumsum([s.n_docs for s in self.shards[:-1]], out=bases[1:])
        self.base = jnp.asarray(bases, jnp.int32)
        # global docid -> app id translation table
        self.doc_map = np.concatenate([s.doc_map for s in self.shards])

    def _shard_executors(self):
        """Lazy per-shard Executors sharing the mesh's device arrays (no
        re-upload): used by paths that need host round-trips mid-query
        (phrase verification)."""
        if getattr(self, "_executors", None) is None:
            from trinity_tpu.exec.executor import Executor

            import jax.numpy as jnp

            exes = []
            for i, s in enumerate(self.shards):
                ex = Executor.__new__(Executor)
                ex.seg = s
                ex.interpret = self.interpret
                ex.bmeta = self.bmeta[i]
                ex.planes = self.planes[i]
                hp = np.ascontiguousarray(s.hit_planes, dtype=np.uint32)
                ex.hit_pw = jnp.asarray(
                    np.vstack([hp, np.zeros((1, 128), np.uint32)])
                )
                ex.hit_off = jnp.asarray(s.hit_group_off.astype(np.int32))
                ex._max_freq_cache = {}
                ex._deleted = None
                ex._deleted_np = None
                exes.append(ex)
            self._executors = exes
        return self._executors

    # ---------------------------------------------------------------- stats
    def doc_freq(self, term: str) -> int:
        df = 0
        for s in self.shards:
            tid = s.term_id(term)
            if tid >= 0:
                df += int(s.term_df[tid])
        return df

    @property
    def docs_cnt(self) -> int:
        return sum(s.n_docs for s in self.shards)

    # --------------------------------------------------------------- search
    def search(self, query, k: int = 10, scorer: str = "bm25"):
        import jax.numpy as jnp

        from trinity_tpu.exec.executor import SearchResult
        from trinity_tpu.ops.postings import compute_cells

        if isinstance(query, str):
            query = parse_query(query)
        root = query.root if isinstance(query, Query) else query
        if root is None:
            return []
        plan = compile_plan(root)
        if plan.has_phrase:
            # phrase queries execute per shard (each shard already holds its
            # device arrays; results merge deterministically because shards
            # are docid-ordered ranges) — the exec_query-per-source model
            stats_docs = self.docs_cnt
            results = []
            for src in self._shard_executors():
                results.extend(
                    src.search(
                        query,
                        k=k,
                        scorer=scorer,
                        stats=_StatsProxy(stats_docs),
                        df_of=self.doc_freq,
                    )
                )
            results.sort(key=lambda r: (-r.score, r.doc_id))
            return results[:k]
        from trinity_tpu.exec.executor import _pad_T

        t_pad = _pad_T(plan.n_slots)
        model = SIMILARITIES[scorer]
        weights = np.array(
            [
                model.weight([self.doc_freq(t) for t in terms], self.docs_cnt)
                for terms in plan.weight_terms
            ],
            np.float32,
        )
        cs_list, cn_list = [], []
        for s in self.shards:
            tids = [s.term_id(t) for t in plan.term_texts]
            cs, cn = compute_cells(s, tids)
            pad_t = t_pad - cs.shape[1]
            cs_list.append(
                np.pad(cs, ((0, self.W - cs.shape[0]), (0, pad_t)))
            )
            cn_list.append(
                np.pad(cn, ((0, self.W - cn.shape[0]), (0, pad_t)))
            )
        run = _build_sharded_fn(
            plan.tape,
            scorer,
            len(self.shards),
            self.W,
            t_pad,
            k,
            self.interpret,
            self.axis,
            self.mesh,
        )
        gv, gi = run(
            self.bmeta,
            self.planes,
            jnp.asarray(np.stack(cs_list)),
            jnp.asarray(np.stack(cn_list)),
            jnp.asarray(weights),
            self.n_docs,
            self.base,
        )
        gv = np.asarray(gv)
        gi = np.asarray(gi)
        out = []
        for v, i in zip(gv, gi):
            if v == NEG_INF:
                break
            out.append(SearchResult(int(self.doc_map[i]), float(v)))
        return out
