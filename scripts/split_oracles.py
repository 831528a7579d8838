#!/usr/bin/env python3
"""One-shot refactor (r11 verdict #7): split SparkEntry.scala's
9k-line oracle tail into per-family objects under graft/oracles/.

Moves (verbatim, zero behavior change):
  - the shared oracle CTE builders  -> OracleCtes.scala
  - oracleSqlBase's Map entries     -> Oracle<Family>.scala (by key)
SparkEntry keeps: the registry (`queries`), the composed `oracleSql`
wrapper, and a thin oracleSqlBase = ++ of the family maps.
"""
import os, re, sys

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "main", "scala", "graft", "SparkEntry.scala")
OUTDIR = os.path.join(os.path.dirname(SRC), "oracles")

lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after {start}")

helpers_start = find(lambda l: l.startswith("  private val knnOracle"))
wrapper_start = find(lambda l: l.startswith("  def oracleSql: Map[String, String] = {"))
base_start = find(lambda l: l.startswith("  private def oracleSqlBase: Map[String, String] = Map("))
# file tail: last two non-empty lines must be "  )" then "}"
tail = [i for i, l in enumerate(lines) if l.strip()]
close_paren, close_brace = tail[-2], tail[-1]
assert lines[close_paren] == "  )" and lines[close_brace] == "}", \
    (lines[close_paren], lines[close_brace])

helper_block = lines[helpers_start:wrapper_start]
body = lines[base_start + 1:close_paren]

# ---- split body into [comments?, entry...] blocks -------------------
bound = re.compile(r'^    "([a-z0-9_]+)" ->')
starts = [i for i, l in enumerate(body) if bound.match(l)]
assert len(starts) > 300, len(starts)
blocks = []   # (key, [lines])
for bi, s in enumerate(starts):
    e = starts[bi + 1] if bi + 1 < len(starts) else len(body)
    blocks.append([bound.match(body[s]).group(1), s, e])
# attach immediately-preceding comment lines to their entry
for b in blocks:
    s = b[1]
    while s > 0 and body[s - 1].lstrip().startswith("//"):
        s -= 1
    b[1] = s
# no gaps: every body line must land in exactly one block
for (k1, s1, e1), (k2, s2, e2) in zip(blocks, blocks[1:]):
    assert e1 == s2 or all(not body[j].strip() for j in range(e1, s2)), \
        (k1, k2, body[e1:s2][:3])

def family(k):
    if k.startswith("mm_") or k == "dedup_phash_hamming":
        return "Multimodal"
    if k.startswith(("dedup_", "decontam_")):
        return "Dedup"
    if (k.startswith(("search_", "hybrid_")) or k.startswith("text_bm25")
            or k in ("text_phrase_search", "text_phrase_near",
                     "doc_semantic_search", "vdb_knn_sparse",
                     "vdb_knn_sparse_indexed")):
        return "Search"
    if k.startswith(("wal_", "stream_", "scd2_")) or k in (
            "vdb_upsert", "vdb_upsert_cas", "vdb_insert", "vdb_delete",
            "vdb_remove", "vdb_snapshot_diff", "vdb_snapshot_replay",
            "vdb_filter_index_build", "vdb_time_travel"):
        return "Store"
    if k.startswith(("ann_", "hnsw_", "lsh_", "mrl_")):
        return "Ann"
    if k.startswith(("embed_", "knn_", "graph_", "sim_")) or k in (
            "centroid_confusion", "mutual_knn_pairs"):
        return "Graph"
    if k.startswith("vdb_"):
        return "Vector"
    if k.startswith(("sketch_", "export_", "corpus_", "dsir_", "hash_")):
        return "Corpus"
    if k.startswith(("text_", "langid_", "bpe_", "quality_", "train_",
                     "chunk_", "pipeline_")):
        return "Text"
    if k.startswith("events_"):
        return "Events"
    return "Tpch"

fams = {}
for k, s, e in blocks:
    fams.setdefault(family(k), []).append((k, s, e))

os.makedirs(OUTDIR, exist_ok=True)
order = sorted(fams)
for fam in order:
    ent_lines = []
    for k, s, e in fams[fam]:
        ent_lines.extend(body[s:e])
    # ensure the chunk's last entry ends with a comma (it does — every
    # entry but possibly the map's final one; add if missing)
    for j in range(len(ent_lines) - 1, -1, -1):
        if ent_lines[j].strip():
            if not ent_lines[j].rstrip().endswith(","):
                ent_lines[j] = ent_lines[j] + ","
            break
    content = "\n".join([
        "package graft",
        "",
        f"/** {fam}-family oracle SQL — split verbatim from SparkEntry",
        "  * (r12, r11 verdict #7). The registry stays in SparkEntry;",
        "  * these maps are its DuckDB mirrors, byte-identical to the",
        "  * pre-split strings.",
        "  */",
        f"private[graft] object Oracle{fam} " + "{",
        "  import OracleCtes._",
        "",
        "  val sql: Map[String, String] = Map(",
    ] + ent_lines + [
        "  )",
        "}",
        "",
    ])
    open(os.path.join(OUTDIR, f"Oracle{fam}.scala"), "w").write(content)
    print(f"Oracle{fam}.scala: {len(fams[fam])} entries, "
          f"{len(ent_lines)} lines")

# ---- OracleCtes.scala ------------------------------------------------
hl = []
for l in helper_block:
    l2 = re.sub(r"^  private (val|def) ", r"  \1 ", l)
    hl.append(l2)
open(os.path.join(OUTDIR, "OracleCtes.scala"), "w").write("\n".join([
    "package graft",
    "",
    "/** Shared oracle CTE builders — split verbatim from SparkEntry",
    "  * (r12, r11 verdict #7): the IVF/PQ/LSH training chains, beam",
    "  * descents, BM25/minhash/WAL scaffolds every family oracle",
    "  * composes. Visibility loosened from `private` to object-local",
    "  * public so the Oracle* family objects can import them; the",
    "  * object itself stays private[graft].",
    "  */",
    "private[graft] object OracleCtes {",
] + hl + [
    "}",
    "",
]))
print(f"OracleCtes.scala: {len(hl)} lines")

# ---- rewrite SparkEntry ---------------------------------------------
concat = " ++\n    ".join(f"Oracle{f}.sql" for f in order)
new_entry = (lines[:helpers_start]
             + lines[wrapper_start:base_start]
             + [f"  private def oracleSqlBase: Map[String, String] =",
                f"    {concat}",
                "}", ""])
open(SRC, "w").write("\n".join(new_entry))
print(f"SparkEntry.scala now {len(new_entry)} lines")
