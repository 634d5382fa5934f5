// Single-core scalar baseline engine: the measured denominator for
// bench.py's vs_baseline (BASELINE.md phase 0).
//
// The upstream reference cannot be built in this image (FastPFor/snappy/
// streamvbyte submodules absent), so this is a minimal from-scratch
// single-threaded engine faithful to its HOT PATH shape:
//   - postings in 128-entry blocks, delta-varbyte docids + varbyte tfs,
//     per-block skip entries (lucene_codec.cpp:568-765 structure: block
//     decode + skiplist seek);
//   - conjunctions via rarest-first leapfrog with block skipping
//     (docset_iterators.cpp:226-348);
//   - disjunctions via document-at-a-time k-way merge over cursors
//     (docset_iterators.cpp:350-405);
//   - phrases via member-AND + per-doc position-list adjacency counting
//     (docwordspace / matched-sequence check);
//   - BM25 per similarity.h:165-255: idf = ln(1+(N-df+.5)/(df+.5)) summed
//     per node, score = idf * tf/(tf+1.2), top-k kept score desc / docid
//     asc (the engine's exact tie-break).
//
// It intentionally does NOT use SIMD intrinsics or threads: the baseline
// claim is "single-core reference-style engine, -O3 scalar". Varbyte block
// decode measures in the hundreds of millions of postings/s here, the same
// order as the reference's SIMD PFor (BASELINE.md).
//
// Input: docs.bin (written by bench.py --build-corpus) + queries file of
// lines "A i j" / "O i j k" / "N i j" / "P i j" (term ids).
// Output: ONE JSON line {"qps","p50_ms","p99_ms",...}.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

static constexpr uint32_t kBlock = 128;
static constexpr float kK1 = 1.2f;

// ----------------------------------------------------------------- corpus
struct Corpus {
  uint32_t n_docs = 0, vocab = 0;
  std::vector<int64_t> bounds;
  std::vector<uint32_t> tokens;
};

static bool load_corpus(const char* path, Corpus& c) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char magic[4];
  if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "TBC1", 4) != 0) {
    fclose(f);
    return false;
  }
  if (fread(&c.n_docs, 4, 1, f) != 1 || fread(&c.vocab, 4, 1, f) != 1) {
    fclose(f);
    return false;
  }
  c.bounds.resize(c.n_docs + 1);
  if (fread(c.bounds.data(), 8, c.n_docs + 1, f) != c.n_docs + 1) {
    fclose(f);
    return false;
  }
  size_t n = (size_t)c.bounds[c.n_docs];
  c.tokens.resize(n);
  if (fread(c.tokens.data(), 4, n, f) != n) {
    fclose(f);
    return false;
  }
  fclose(f);
  return true;
}

// ------------------------------------------------------------------ varint
static inline void put_varint(std::vector<uint8_t>& out, uint32_t v) {
  while (v >= 0x80) {
    out.push_back((uint8_t)(v | 0x80));
    v >>= 7;
  }
  out.push_back((uint8_t)v);
}

static inline uint32_t get_varint(const uint8_t*& p) {
  uint32_t v = *p & 0x7f;
  int shift = 7;
  while (*p & 0x80) {
    ++p;
    v |= (uint32_t)(*p & 0x7f) << shift;
    shift += 7;
  }
  ++p;
  return v;
}

// ------------------------------------------------------------------- index
struct TermIndex {
  uint32_t df = 0;
  uint64_t sum_tf = 0;
  std::vector<uint8_t> docs_bytes;   // blocks of (delta docid, tf) varints
  std::vector<uint8_t> pos_bytes;    // per hit: delta-varbyte positions
  std::vector<uint32_t> skip_last;   // last docid per block
  std::vector<uint32_t> skip_off;    // byte offset of block in docs_bytes
  std::vector<uint64_t> skip_poff;   // pos_bytes offset at block start
};

struct Index {
  uint32_t n_docs = 0;
  std::vector<TermIndex> terms;
  double build_s = 0;
  uint64_t n_postings = 0;
};

static void build_index(const Corpus& c, Index& ix) {
  auto t0 = std::chrono::steady_clock::now();
  ix.n_docs = c.n_docs;
  ix.terms.resize(c.vocab);
  // one doc at a time: sort (token, pos), emit runs into per-term encoders
  std::vector<std::pair<uint32_t, uint32_t>> buf;
  std::vector<uint32_t> last_doc(c.vocab, UINT32_MAX);
  std::vector<uint32_t> in_block(c.vocab, 0);  // postings in current block
  for (uint32_t d = 0; d < c.n_docs; ++d) {
    int64_t b = c.bounds[d], e = c.bounds[d + 1];
    buf.clear();
    for (int64_t i = b; i < e; ++i)
      buf.emplace_back(c.tokens[i], (uint32_t)(i - b + 1));
    std::sort(buf.begin(), buf.end());
    for (size_t i = 0; i < buf.size();) {
      uint32_t t = buf[i].first;
      size_t j = i;
      while (j < buf.size() && buf[j].first == t) ++j;
      uint32_t tf = (uint32_t)(j - i);
      TermIndex& ti = ix.terms[t];
      if (in_block[t] == 0) {  // open a new block
        ti.skip_off.push_back((uint32_t)ti.docs_bytes.size());
        ti.skip_poff.push_back(ti.pos_bytes.size());
        ti.skip_last.push_back(0);
        last_doc[t] = UINT32_MAX;
      }
      uint32_t prev = last_doc[t] == UINT32_MAX ? 0 : last_doc[t];
      uint32_t delta = last_doc[t] == UINT32_MAX ? d : d - prev;
      put_varint(ti.docs_bytes, delta);
      put_varint(ti.docs_bytes, tf);
      uint32_t pp = 0;
      for (size_t h = i; h < j; ++h) {
        put_varint(ti.pos_bytes, buf[h].second - pp);
        pp = buf[h].second;
      }
      last_doc[t] = d;
      ti.skip_last.back() = d;
      ti.df++;
      ti.sum_tf += tf;
      if (++in_block[t] == kBlock) in_block[t] = 0;
      ix.n_postings++;
      i = j;
    }
  }
  ix.build_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
}

// ------------------------------------------------------------------ cursor
struct Cursor {
  const TermIndex* t = nullptr;
  float weight = 0;
  uint32_t n_blocks = 0, block = UINT32_MAX;
  uint32_t ndec = 0, within = 0;
  uint32_t docs[kBlock], tfs[kBlock];
  bool exhausted = true;

  void init(const TermIndex* ti, float w) {
    t = ti;
    weight = w;
    n_blocks = (uint32_t)ti->skip_off.size();
    block = UINT32_MAX;
    exhausted = ti->df == 0;
    if (!exhausted) load_block(0);
  }
  void load_block(uint32_t bi) {
    block = bi;
    uint32_t first = bi * kBlock;
    ndec = std::min(kBlock, t->df - first);
    const uint8_t* p = t->docs_bytes.data() + t->skip_off[bi];
    uint32_t doc = 0;
    for (uint32_t i = 0; i < ndec; ++i) {
      uint32_t delta = get_varint(p);
      doc = (i == 0) ? delta : doc + delta;
      docs[i] = doc;
      tfs[i] = get_varint(p);
    }
    within = 0;
  }
  bool next() {
    if (exhausted) return false;
    if (++within >= ndec) {
      if (block + 1 >= n_blocks) {
        exhausted = true;
        return false;
      }
      load_block(block + 1);
    }
    return true;
  }
  // advance to first doc >= target
  bool advance(uint32_t target) {
    if (exhausted) return false;
    if (docs[ndec - 1] < target) {
      // seek via skip list (first block whose last >= target)
      uint32_t lo = block + 1, hi = n_blocks;
      if (lo >= hi || t->skip_last.back() < target) {
        exhausted = true;
        return false;
      }
      while (lo < hi) {
        uint32_t mid = (lo + hi) / 2;
        if (t->skip_last[mid] < target)
          lo = mid + 1;
        else
          hi = mid;
      }
      load_block(lo);
    }
    // in-block: galloping lower_bound
    const uint32_t* it =
        std::lower_bound(docs + within, docs + ndec, target);
    within = (uint32_t)(it - docs);
    if (within >= ndec) {  // target between blocks
      if (block + 1 >= n_blocks) {
        exhausted = true;
        return false;
      }
      load_block(block + 1);
    }
    return true;
  }
  uint32_t doc() const { return docs[within]; }
  uint32_t tf() const { return tfs[within]; }
  // decode current posting's positions (phrase path)
  void positions(std::vector<uint32_t>& out) {
    out.clear();
    // find byte offset: walk from block start skipping earlier postings
    const uint8_t* p = t->pos_bytes.data() + t->skip_poff[block];
    for (uint32_t i = 0; i < within; ++i)
      for (uint32_t h = 0; h < tfs[i]; ++h) get_varint(p);
    uint32_t pos = 0;
    for (uint32_t h = 0; h < tfs[within]; ++h) {
      pos += get_varint(p);
      out.push_back(pos);
    }
  }
};

// ------------------------------------------------------------------ top-k
struct TopK {
  // min-heap of (score, doc); weakest = lowest score, tie: HIGHER doc is
  // weaker (tie-break score desc, docid asc)
  std::vector<std::pair<float, uint32_t>> h;
  uint32_t k;
  explicit TopK(uint32_t kk) : k(kk) { h.reserve(kk); }
  static bool weaker(const std::pair<float, uint32_t>& a,
                     const std::pair<float, uint32_t>& b) {
    return a.first != b.first ? a.first > b.first : a.second < b.second;
  }
  void offer(float s, uint32_t d) {
    if (h.size() < k) {
      h.emplace_back(s, d);
      std::push_heap(h.begin(), h.end(), weaker);
    } else if (s > h.front().first) {  // equal score: earlier doc already in
      std::pop_heap(h.begin(), h.end(), weaker);
      h.back() = {s, d};
      std::push_heap(h.begin(), h.end(), weaker);
    }
  }
  void sorted(std::vector<std::pair<float, uint32_t>>& out) {
    // strongest first: weaker() returns "a ranks above b" (score desc,
    // docid asc), so it IS the strict ordering for the final sort
    out = h;
    std::sort(out.begin(), out.end(),
              [](const auto& a, const auto& b) { return weaker(a, b); });
  }
};

// ------------------------------------------------------------------ query
struct Query {
  // 'A' and, 'O' or, 'N' not (last term negated), 'P' phrase (any arity),
  // 'S' k-of-n ("S k t1 .. tn", DisjunctionSome semantics,
  // docset_iterators.h:38-140), 'B' OR-of-AND ("B n1 a1..an1 n2 b1..bn2")
  char kind;
  std::vector<uint32_t> terms;
  uint32_t min_match = 1;                     // 'S'
  std::vector<std::vector<uint32_t>> groups;  // 'B'
};

static float idf(uint32_t df, uint32_t n_docs) {
  return (float)std::log(1.0 + (n_docs - df + 0.5) / (df + 0.5));
}

static inline float bm25(float w, uint32_t tf) {
  return w * (float)tf / ((float)tf + kK1);
}

// leapfrog conjunction over a term group (docset_iterators.cpp:226-348),
// used standalone for OR-of-AND groups
struct ConjGroup {
  std::vector<Cursor> cs;  // rarest-first
  bool dead = true;
  uint32_t cur = UINT32_MAX;
  float cur_score = 0;

  void init(const Index& ix, const std::vector<uint32_t>& terms) {
    for (uint32_t t : terms)
      if (ix.terms[t].df == 0) return;  // group can never match
    std::vector<uint32_t> req(terms);
    std::sort(req.begin(), req.end(), [&](uint32_t a, uint32_t b) {
      return ix.terms[a].df < ix.terms[b].df;
    });
    cs.resize(req.size());
    for (size_t i = 0; i < req.size(); ++i)
      cs[i].init(&ix.terms[req[i]],
                 idf(ix.terms[req[i]].df, ix.n_docs));
    dead = false;
    settle(cs[0].doc());
  }
  // position every member on the first agreed doc >= target
  void settle(uint32_t target) {
    uint32_t d = target;
    for (;;) {
      if (!cs[0].advance(d)) {
        dead = true;
        return;
      }
      d = cs[0].doc();
      bool agree = true;
      for (size_t i = 1; i < cs.size(); ++i) {
        if (!cs[i].advance(d)) {
          dead = true;
          return;
        }
        if (cs[i].doc() != d) {
          d = cs[i].doc();
          agree = false;
          break;
        }
      }
      if (agree) {
        cur = d;
        cur_score = 0;
        for (auto& c : cs) cur_score += bm25(c.weight, c.tf());
        return;
      }
    }
  }
  void next() {
    if (dead) return;
    if (!cs[0].next()) {
      dead = true;
      return;
    }
    settle(cs[0].doc());
  }
};

static void run_query(const Index& ix, const Query& q, TopK& top,
                      std::vector<Cursor>& cs, std::vector<uint32_t>& pa,
                      std::vector<uint32_t>& pb) {
  uint32_t N = ix.n_docs;
  if (q.kind == 'O' || q.kind == 'S') {
    cs.clear();
    for (uint32_t t : q.terms) {
      if (ix.terms[t].df == 0) continue;
      cs.emplace_back();
      cs.back().init(&ix.terms[t], idf(ix.terms[t].df, N));
    }
    if (cs.size() < (q.kind == 'S' ? q.min_match : 1)) return;
    // document-at-a-time k-way merge (small fan-in: linear min scan);
    // 'S' adds the DisjunctionSome match-count threshold
    // (docset_iterators.cpp:679-811 semantics, scalar driver)
    for (;;) {
      uint32_t mind = UINT32_MAX;
      for (auto& c : cs)
        if (!c.exhausted) mind = std::min(mind, c.doc());
      if (mind == UINT32_MAX) break;
      float s = 0;
      uint32_t cnt = 0;
      for (auto& c : cs)
        if (!c.exhausted && c.doc() == mind) {
          s += bm25(c.weight, c.tf());
          ++cnt;
        }
      if (cnt >= q.min_match) top.offer(s, mind);
      for (auto& c : cs)
        if (!c.exhausted && c.doc() == mind) c.next();
    }
    return;
  }
  if (q.kind == 'B') {
    // OR of AND-groups: DAAT merge over conjunction iterators
    // (build_iterator composing Conjunction under Disjunction,
    // exec.cpp:253-449); score sums the groups matching the doc
    std::vector<ConjGroup> gs(q.groups.size());
    for (size_t i = 0; i < q.groups.size(); ++i) gs[i].init(ix, q.groups[i]);
    for (;;) {
      uint32_t mind = UINT32_MAX;
      for (auto& g : gs)
        if (!g.dead) mind = std::min(mind, g.cur);
      if (mind == UINT32_MAX) break;
      float s = 0;
      for (auto& g : gs)
        if (!g.dead && g.cur == mind) s += g.cur_score;
      top.offer(s, mind);
      for (auto& g : gs)
        if (!g.dead && g.cur == mind) g.next();
    }
    return;
  }
  // AND-style driver (A, N, P): required members sorted rarest-first.
  // Phrases conjoin UNIQUE members (repeated members share one cursor —
  // the "t w t" case), then verify adjacency over decoded positions.
  std::vector<uint32_t> req(q.terms);
  uint32_t excl_term = UINT32_MAX;
  if (q.kind == 'N') {
    excl_term = req.back();
    req.pop_back();
  }
  if (q.kind == 'P') {
    std::sort(req.begin(), req.end());
    req.erase(std::unique(req.begin(), req.end()), req.end());
  }
  for (uint32_t t : req)
    if (ix.terms[t].df == 0) return;  // empty conjunction
  std::sort(req.begin(), req.end(), [&](uint32_t a, uint32_t b) {
    return ix.terms[a].df < ix.terms[b].df;
  });
  cs.clear();
  for (size_t i = 0; i < req.size(); ++i) {
    cs.emplace_back();
    cs.back().init(&ix.terms[req[i]], idf(ix.terms[req[i]].df, N));
  }
  // phrase slot -> cursor index (query order drives adjacency)
  std::vector<uint32_t> slot_cursor(q.terms.size());
  if (q.kind == 'P')
    for (size_t s = 0; s < q.terms.size(); ++s)
      slot_cursor[s] = (uint32_t)(
          std::find(req.begin(), req.end(), q.terms[s]) - req.begin());
  std::vector<std::vector<uint32_t>> mpos(req.size());
  Cursor ex;
  if (excl_term != UINT32_MAX && ix.terms[excl_term].df > 0)
    ex.init(&ix.terms[excl_term], 0);
  uint32_t d = cs[0].doc();
  for (;;) {
    // leapfrog: every member reaches d or we re-seed
    bool agree = true;
    for (size_t i = 1; i < cs.size(); ++i) {
      if (!cs[i].advance(d)) return;
      if (cs[i].doc() != d) {
        d = cs[i].doc();
        if (!cs[0].advance(d)) return;
        d = cs[0].doc();
        agree = false;
        break;
      }
    }
    if (!agree) continue;
    bool excluded = false;
    if (excl_term != UINT32_MAX && !ex.exhausted && ex.advance(d))
      excluded = !ex.exhausted && ex.doc() == d;
    if (!excluded) {
      if (q.kind == 'P') {
        // adjacency count over N members: a phrase occurrence is a
        // position p of slot 0 with slot i present at p+i for all i
        // (docwordspace.cpp:3-15 test_phrase semantics)
        for (size_t i = 0; i < cs.size(); ++i) cs[i].positions(mpos[i]);
        const auto& first = mpos[slot_cursor[0]];
        uint32_t pf = 0;
        for (uint32_t p : first) {
          bool ok = true;
          for (size_t s = 1; s < q.terms.size() && ok; ++s) {
            const auto& v = mpos[slot_cursor[s]];
            ok = std::binary_search(v.begin(), v.end(), p + (uint32_t)s);
          }
          if (ok) ++pf;
        }
        if (pf > 0) {
          float w = 0;
          for (uint32_t t : q.terms) w += idf(ix.terms[t].df, N);
          top.offer(bm25(w, pf), d);
        }
      } else {
        float s = 0;
        for (auto& c : cs) s += bm25(c.weight, c.tf());
        top.offer(s, d);
      }
    }
    if (!cs[0].next()) return;
    d = cs[0].doc();
  }
}

// -------------------------------------------------------------------- main
int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s docs.bin queries.txt [--dump-topk out.txt] "
            "[--min-seconds S]\n",
            argv[0]);
    return 2;
  }
  const char* dump_path = nullptr;
  double min_seconds = 3.0;
  for (int i = 3; i < argc; ++i) {
    if (!strcmp(argv[i], "--dump-topk") && i + 1 < argc)
      dump_path = argv[++i];
    else if (!strcmp(argv[i], "--min-seconds") && i + 1 < argc)
      min_seconds = atof(argv[++i]);
  }
  Corpus corpus;
  if (!load_corpus(argv[1], corpus)) {
    fprintf(stderr, "cannot load %s\n", argv[1]);
    return 1;
  }
  std::vector<Query> queries;
  {
    FILE* f = fopen(argv[2], "r");
    if (!f) {
      fprintf(stderr, "cannot open %s\n", argv[2]);
      return 1;
    }
    char line[512];
    while (fgets(line, sizeof line, f)) {
      Query q;
      char* p = line;
      while (*p == ' ') ++p;
      if (!*p || *p == '\n' || *p == '#') continue;
      q.kind = *p++;
      std::vector<uint32_t> nums;
      for (;;) {
        while (*p == ' ') ++p;
        if (!*p || *p == '\n') break;
        nums.push_back((uint32_t)strtoul(p, &p, 10));
      }
      if (q.kind == 'S') {
        // "S k t1 .. tn"
        q.min_match = nums.empty() ? 1 : nums[0];
        q.terms.assign(nums.begin() + (nums.empty() ? 0 : 1), nums.end());
      } else if (q.kind == 'B') {
        // "B n1 a1..an1 n2 b1..bn2 ..." — OR of AND groups
        size_t i = 0;
        while (i < nums.size()) {
          uint32_t n = nums[i++];
          std::vector<uint32_t> g;
          for (uint32_t j = 0; j < n && i < nums.size(); ++j)
            g.push_back(nums[i++]);
          if (!g.empty()) q.groups.push_back(std::move(g));
        }
      } else {
        q.terms = std::move(nums);
      }
      queries.push_back(std::move(q));
    }
    fclose(f);
  }
  Index ix;
  build_index(corpus, ix);

  std::vector<Cursor> cs;
  std::vector<uint32_t> pa, pb;
  std::vector<std::pair<float, uint32_t>> out;

  auto run_all = [&](std::vector<double>* lat, FILE* dump) {
    for (auto& q : queries) {
      auto t0 = std::chrono::steady_clock::now();
      TopK top(10);
      run_query(ix, q, top, cs, pa, pb);
      if (lat)
        lat->push_back(std::chrono::duration<double>(
                           std::chrono::steady_clock::now() - t0)
                           .count());
      if (dump) {
        top.sorted(out);
        for (auto& r : out) fprintf(dump, "%u:%.6g ", r.second, r.first);
        fprintf(dump, "\n");
      }
    }
  };
  run_all(nullptr, nullptr);  // warm pass (page in, branch predictors)
  if (dump_path) {
    FILE* df = fopen(dump_path, "w");
    run_all(nullptr, df);
    fclose(df);
  }
  std::vector<double> lat;
  auto t0 = std::chrono::steady_clock::now();
  int passes = 0;
  double elapsed = 0;
  do {
    run_all(&lat, nullptr);
    ++passes;
    elapsed = std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                            t0)
                  .count();
  } while (elapsed < min_seconds || passes < 3);
  std::sort(lat.begin(), lat.end());
  double qps = lat.size() / elapsed;
  auto pct = [&](double q) {
    size_t i = (size_t)(q * (lat.size() - 1));
    return lat[i] * 1e3;
  };
  printf(
      "{\"qps\": %.2f, \"p50_ms\": %.3f, \"p99_ms\": %.3f, \"n_queries\": "
      "%zu, \"passes\": %d, \"build_s\": %.1f, \"postings\": %llu}\n",
      qps, pct(0.50), pct(0.99), queries.size(), passes, ix.build_s,
      (unsigned long long)ix.n_postings);
  return 0;
}
