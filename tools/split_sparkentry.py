#!/usr/bin/env python3
"""One-shot mechanical splitter for SparkEntry.scala (round-12 task #6).

Splits the 21.7k-line object into family trait files behind the same
`queries` / `oracleSql` maps. Pure text surgery at entry boundaries —
no entry body is modified, so the 421 result hashes cannot change.
"""
import re, sys, collections

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")
N = len(lines)

def find(pred, start=0):
    for i in range(start, N):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found from {start}")

qdef = find(lambda l: l.startswith("  def queries"))
odef = find(lambda l: l.startswith("  def oracleSql"))
shared_marker = find(lambda l: "---- shared fragments" in l)
oracle_marker = find(lambda l: "---- oracles" in l)

# closing "  )" of the queries map: last "  )" before oracle_marker
qclose = max(i for i in range(qdef, oracle_marker) if lines[i] == "  )")
# closing "  )" of the oracle map: last "  )" line in file
oclose = max(i for i in range(odef, N) if lines[i] == "  )")
objclose = find(lambda l: l == "}", oclose)

ENTRY = re.compile(r'^    "([a-z0-9_]+)" ->')

def blocks(lo, hi):
    """Partition lines[lo:hi] into (name, [lines]) entry blocks, attaching
    the comment/blank lines that precede an entry to that entry."""
    starts = [i for i in range(lo, hi) if ENTRY.match(lines[i])]
    out = []
    for k, s in enumerate(starts):
        e = starts[k + 1] if k + 1 < len(starts) else hi
        # pull leading comments of the NEXT entry out of this block
        while e - 1 > s and (lines[e - 1].strip() == "" or
                             lines[e - 1].lstrip().startswith("//") or
                             lines[e - 1].lstrip().startswith("/**") or
                             lines[e - 1].lstrip().startswith("*")):
            e -= 1
        out.append((ENTRY.match(lines[s]).group(1), lines[s if k == 0 else out[-1][2]:e] if False else None, e))
    # second pass: block k spans [prev_end, end); first block starts at lo
    res = []
    prev = lo
    for k, s in enumerate(starts):
        name = ENTRY.match(lines[s]).group(1)
        end = out[k][2]
        res.append((name, lines[prev:end]))
        prev = end
    return res

qblocks = blocks(qdef + 1, qclose)
oblocks = blocks(odef + 1, oclose)
assert len(qblocks) == len(oblocks) == 421, (len(qblocks), len(oblocks))
qnames = [n for n, _ in qblocks]
onames = [n for n, _ in oblocks]
assert set(qnames) == set(onames)

# ---- classification -----------------------------------------------------
FAMILIES = [
    ("Streaming", r'^streaming_'),
    ("Dedup", r'dedup|minhash|simhash|fingerprint|cdc_|winnow|shingle|'
              r'decontam|jaccard|url_canonical|neardup|lsh|containment|'
              r'blocking|semdedup|exact_survivors|snm|crosslingual'),
    ("Graph", r'knn|graph|pagerank|components$|_components|component_|sssp|'
              r'triangle|label_propagation|ivm_|bfs|onion|assortativity|'
              r'bridge|community|motif|jaccard_links|adamic'),
    ("Embedding", r'embed|ann_|ivf|_pq_|^pq_|quantiz|cosine|centroid|'
                  r'vector|mmr|rag_|semantic|umap|mrr'),
    ("Text", r'token|tfidf|bm25|pmi|zipf|perplex|gopher|pii|vocab|bpe|'
             r'lang|text|quality|stopword|readability|bleu|rouge|'
             r'phrase|collocation|keybert|entropy|char_|word|doc_|'
             r'mlm|chunk|corpus|heaps|typetoken'),
    ("TimeSeries", r'resample|session|watermark|interval|asof|rollover|'
                   r'contract|ohlcv|candle|bollinger|rsi|macd|vwap|'
                   r'autocorr|changepoint|cusum|seasonal|trend|'
                   r'backadjust|bars|tick|calendar|business_day|'
                   r'time_|timer|gap|hurst|kalman|ewma|stl_|sax_'),
    ("Ingest", r'ingest|schema|partition|dpp|json|csv|avro|orc|xml|'
               r'variant|scd2|snapshot|merge|upsert|evolution|bucketed|'
               r'zorder|hilbert|layout|compaction|vacuum|clustering_keys'),
    ("Tpch", r'^tpch_|^subquery_|^rollup|^cube_|region_revenue'),
    ("Multimodal", r'multimodal|video|audio|image|frame'),
    ("Sampling", r'sample|split|stratif|bootstrap|temperature|curriculum|'
                 r'pack_|knapsack|budget|reservoir|shard|mix_'),
    ("Sketch", r'hll|bloom|countmin|sketch|kmv|checksum|capture_recapture|'
               r'approx|cardinal|overlap|integrity|histogram|profile'),
    ("Stats", r'anomaly|percentile|quantile|zscore|chi2|kappa|_alpha|cuped|'
              r'diff_in_diff|ab_test|metric|funnel|retention|cohort|ltv|'
              r'stickiness|benford|gini|anova|ttest|regress|slope|'
              r'correlat|covar|simpson|chao1|richness|diversity|'
              r'calibration|conformal|elasticity|design_effect|'
              r'bcubed|mad_|cronbach|krippendorff|audit|anonymity'),
]
def classify(n):
    for fam, pat in FAMILIES:
        if re.search(pat, n):
            return fam
    return "Analytics"

fam_of = {n: classify(n) for n in qnames}
counts = collections.Counter(fam_of.values())

def block_text(blk):
    t = "\n".join(blk).rstrip()
    if t.endswith(","):
        t = t[:-1]
    return t

qtext = {n: block_text(b) for n, b in qblocks}
otext = {n: block_text(b) for n, b in oblocks}

# line budget per family (queries + oracles), keep each FILE under ~5500
fam_lines = collections.Counter()
for n in qnames:
    fam_lines[fam_of[n]] += qtext[n].count("\n") + otext[n].count("\n") + 6

if "--dry" in sys.argv:
    for f in sorted(counts):
        print(f, counts[f], fam_lines[f])
    un = [n for n in qnames if fam_of[n] == "Analytics"]
    print("Analytics sample:", un[:60])
    sys.exit(0)

IMPORTS = """package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}
"""

# ---- emit family files ----------------------------------------------------
MAXL = 5200
emitted = []  # (traitName, fileName)
for fam in sorted(counts):
    names = [n for n in qnames if fam_of[n] == fam]  # preserve file order
    # partition into parts under MAXL
    parts, cur, curl = [], [], 0
    for n in names:
        l = qtext[n].count("\n") + otext[n].count("\n") + 6
        if cur and curl + l > MAXL:
            parts.append(cur); cur, curl = [], 0
        cur.append(n); curl += l
    if cur:
        parts.append(cur)
    for pi, part in enumerate(parts):
        suffix = "" if len(parts) == 1 else str(pi + 1)
        tname = f"Queries{fam}{suffix}"
        mname = fam[0].lower() + fam[1:] + suffix
        body = [IMPORTS]
        body.append(f"/** {fam} family queries + DuckDB oracles (split from the")
        body.append("  * monolithic SparkEntry in round 12; entry bodies unchanged). */")
        body.append(f"private[graft] trait {tname} extends QueryShared {{")
        body.append("")
        body.append(f"  protected def {mname}Queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
        body.append(",\n\n".join(qtext[n] for n in part))
        body.append("  )")
        body.append("")
        body.append(f"  protected def {mname}Oracles: Map[String, String] = Map(")
        body.append(",\n\n".join(otext[n] for n in part))
        body.append("  )")
        body.append("}")
        fn = f"src/main/scala/graft/{tname}.scala"
        open(fn, "w").write("\n".join(body) + "\n")
        emitted.append((tname, mname))

# ---- QueryShared ----------------------------------------------------------
shared1 = lines[shared_marker:qdef]          # helper section 1
shared2 = lines[oracle_marker:odef]          # helper section 2 (oracle SQL builders)
def protect(ls):
    return [re.sub(r'^  private ', '  protected ', l) for l in ls]
qs = [IMPORTS]
qs.append("/** Shared fragments used across the query-family traits: staging")
qs.append("  * helpers, calendar dims, and parameterized oracle-SQL builders.")
qs.append("  * Split from the monolithic SparkEntry in round 12 (bodies unchanged,")
qs.append("  * `private` widened to `protected` so family traits can inherit). */")
qs.append("private[graft] trait QueryShared {")
qs.extend(protect(shared1))
qs.extend(protect(shared2))
qs.append("}")
open("src/main/scala/graft/QueryShared.scala", "w").write("\n".join(qs) + "\n")

# ---- new SparkEntry --------------------------------------------------------
head = lines[:shared_marker]   # includes object decl + entry()
head[find(lambda l: l.startswith("object SparkEntry"), 0)] = (
    "object SparkEntry extends QueryShared\n    with "
    + "\n    with ".join(t for t, _ in emitted) + " {")
se = head[:]
se.append("  /** One entry per implemented operator (SURVEY.md §2) — merged from")
se.append("    * the family traits; names are globally unique (asserted below). */")
se.append("  def queries: Map[String, (SparkSession, String) => DataFrame] =")
se.append("    " + " ++ ".join(m + "Queries" for _, m in emitted))
se.append("")
se.append("  def oracleSql: Map[String, String] =")
se.append("    " + " ++ ".join(m + "Oracles" for _, m in emitted))
se.append("")
se.append("  // A duplicate name across family traits would silently drop a query")
se.append("  // (Map ++ keeps the right operand) — fail fast at first access instead.")
se.append("  require(")
se.append("    " + " + ".join(m + "Queries.size" for _, m in emitted) + " == queries.size,")
se.append("    \"duplicate query name across family traits\")")
se.append("}")
open(SRC, "w").write("\n".join(se) + "\n")
print("families:", emitted)
print("total queries:", sum(counts.values()))
