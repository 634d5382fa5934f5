"""trinity_tpu quickstart: index, search, update, merge, percolate, shard.

Run: python examples/quickstart.py   (CPU or TPU; small corpus)
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import trinity_tpu as T
from trinity_tpu.exec.richmatch import exec_rich
from trinity_tpu.parallel import MeshExecutor

DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "apple iphone with retina display",
    3: "apple macbook pro retina display",
    4: "quick brown dogs and quick foxes",
    5: "new york city fox terrier club",
}

# ---- index a segment --------------------------------------------------
sess = T.SegmentIndexSession()
sess.bulk_index(DOCS.keys(), [t.split() for t in DOCS.values()])
seg = sess.commit()

# ---- ranked search (AccumulatedScoreScheme, BM25 top-k) ---------------
ex = T.Executor(seg)
print("quick OR fox:")
for hit in ex.search("quick OR fox", k=5):
    print(f"  doc {hit.doc_id}  score {hit.score:.4f}")

print('phrase "quick brown":', [h.doc_id for h in ex.search('"quick brown"')])
print("docs-only (fox -dog):", list(ex.match_ids("fox -dog")))

# ---- rich matches: positions, proximity scratchpad --------------------
def on_match(m):
    fox = m.term("fox")
    print(f"  doc {m.doc_id}: fox at {[h.pos for h in fox.hits]}")

print("rich matches for 'fox':")
exec_rich(ex, "fox", on_match)

# ---- updates/deletes via generations ----------------------------------
s2 = T.SegmentIndexSession()
p = s2.begin(2)
for i, tok in enumerate("apple iphone discontinued".split(), 1):
    p.insert(tok, i)
s2.update(p)      # replaces doc 2
s2.erase(3)       # removes doc 3
coll = (
    T.IndexSourcesCollection()
    .add_segment(seg, generation=100)
    .add_segment(s2.commit(), generation=200)
    .commit()
)
print("after update+erase, 'retina':", [h.doc_id for h in coll.search("retina")])

# ---- merge/compaction ---------------------------------------------------
mc = T.MergeCandidatesCollection()
for src in coll.sources:
    mc.add_source(src)
merged = mc.merge(keep_updated_ids=False)
print("merged:", merged.n_docs, "live docs")

# ---- percolation (reverse search) --------------------------------------
perc = T.Percolator()
q_news = perc.register('"breaking news"')
q_fox = perc.register("fox OR foxes")
print("percolate:", perc.match("breaking news about a fox".split()))

# ---- multi-chip sharding ------------------------------------------------
mex = MeshExecutor(merged, n_shards=min(2, merged.n_windows))
print("sharded 'quick':", [h.doc_id for h in mex.search("quick")])
