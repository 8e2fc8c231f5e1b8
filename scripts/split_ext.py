#!/usr/bin/env python3
"""One-shot mechanical splitter for queries/Ext.scala (round 12).

Turns the single 7.7k-line `object Ext` into per-family traits under
src/main/scala/graft/queries/ext/ plus an ExtHelpers trait holding every
shared private helper, and rewrites Ext.scala as
`object Ext extends ExtHelpers with <families> { def all = <unchanged> }`.
Pure relocation: member texts are moved verbatim (only the `private `
modifier on helpers widens to `private[queries] ` so cross-trait
references keep compiling).
"""
import re, sys, os

SRC = "src/main/scala/graft/queries/Ext.scala"
OUTDIR = "src/main/scala/graft/queries/ext"

text = open(SRC).read()
lines = text.split("\n")

# ---- locate regions ------------------------------------------------------
marker_re = re.compile(r"^  // -+ q(\d+)$")
marker_idx = [i for i, l in enumerate(lines) if marker_re.match(l)]
first_marker = marker_idx[0]
tail_start = next(i for i, l in enumerate(lines)
                  if l.startswith("  def all: Seq[Q]"))
obj_start = next(i for i, l in enumerate(lines)
                 if l.startswith("object Ext {"))

header = lines[:obj_start]            # package, imports, object scaladoc
preamble = lines[obj_start + 1:first_marker]
tail = lines[tail_start:]             # def all ... + closing }

blocks = []                           # (qnum, lines)
bounds = marker_idx + [tail_start]
for a, b in zip(bounds, bounds[1:]):
    blocks.append((int(marker_re.match(lines[a]).group(1)),
                   lines[a:b]))

# ---- mini-lexer: paren/brace balance ignoring strings/comments -----------
def scan_balance(line, state):
    """state: (mode,) where mode in {code, triple}. Returns (delta, state)."""
    mode = state
    bal = 0
    i, n = 0, len(line)
    while i < n:
        if mode == "triple":
            j = line.find('"""', i)
            if j < 0:
                return bal, "triple"
            i = j + 3
            # lexer quirk: s"""..."""" (4 quotes) never appears in this file
            mode = "code"
            continue
        c = line[i]
        if line.startswith('"""', i):
            mode = "triple"; i += 3; continue
        if c == '"':
            i += 1
            while i < n:
                if line[i] == "\\":
                    i += 2; continue
                if line[i] == '"':
                    i += 1; break
                i += 1
            continue
        if c == "'":
            # char literal like 'a' or '\\n' (symbols don't appear here)
            if i + 2 < n and line[i + 1] == "\\" and line[i + 3:i + 4] == "'":
                i += 4; continue
            if i + 2 <= n and line[i + 2:i + 3] == "'":
                i += 3; continue
            i += 1; continue
        if line.startswith("//", i):
            break
        if c in "({[":
            bal += 1
        elif c in ")}]":
            bal -= 1
        i += 1
    return bal, mode

member_start = re.compile(r"^  (/\*\*|//|private |val |def |lazy )")

def split_members(region_lines):
    """Split a region into members: list of (kind, name, lines).
    kind in {helper, query}; comments attach to the following member."""
    members = []
    i = 0
    pending_comments = []
    while i < len(region_lines):
        l = region_lines[i]
        if not l.strip():
            i += 1
            continue
        if l.lstrip().startswith(("/**", "*", "//")) and not re.match(
                r"^  (private |val |def |lazy )", l):
            # comment chunk: consume scaladoc until */ or single // lines
            if l.lstrip().startswith("/**"):
                j = i
                while "*/" not in region_lines[j]:
                    j += 1
                pending_comments.extend(region_lines[i:j + 1])
                i = j + 1
            else:
                pending_comments.append(l)
                i += 1
            continue
        m = re.match(r"^  (private(?:\[\w+\])? )?(?:lazy )?(val|def) (\w+)", l)
        if not m:
            sys.exit(f"unparsed member line {i}: {l!r}")
        name = m.group(3)
        is_helper = bool(m.group(1)) or not re.match(r"q\d+$", name)
        # consume the definition: balance 0 AND next line is a member start
        bal, mode = 0, "code"
        j = i
        while True:
            d, mode = scan_balance(region_lines[j], mode)
            bal += d
            j += 1
            if bal == 0 and mode == "code":
                nxt = j
                while nxt < len(region_lines) and not region_lines[nxt].strip():
                    nxt += 1
                if nxt >= len(region_lines) or member_start.match(
                        region_lines[nxt]):
                    break
            if j >= len(region_lines):
                break
        members.append(("helper" if is_helper else "query", name,
                        pending_comments + region_lines[i:j]))
        pending_comments = []
        i = j
    if pending_comments:
        sys.exit("dangling comments at region end")
    return members

helpers = []     # member line-lists, in original order
queries = {}     # qnum -> (name, lines incl. marker comment)

for m in split_members(preamble):
    assert m[0] == "helper", m[1]
    helpers.append(m[2])

for qnum, blk in blocks:
    marker = blk[0]
    mems = split_members(blk[1:])
    qlines = [marker]
    for kind, name, mlines in mems:
        if kind == "helper":
            helpers.append(mlines)
        else:
            assert name == f"q{qnum}", (name, qnum)
            qlines += mlines
    queries[qnum] = qlines

# ---- classification ------------------------------------------------------
FAMILY_OF_OP = {
    "Dedup": "ExtDedupQ", "TextAnalysis": "ExtTextQ",
    "Similarity": "ExtSimilarityQ", "Retrieval": "ExtSimilarityQ",
    "Quantize": "ExtSimilarityQ", "Sketch": "ExtSketchQ",
    "Sampling": "ExtSamplingQ", "Packing": "ExtSamplingQ",
    "Multimodal": "ExtMultimodalQ", "Profiling": "ExtProfilingQ",
    "Drift": "ExtProfilingQ", "Trend": "ExtTemporalQ",
    "Rolling": "ExtTemporalQ", "Cohorts": "ExtTemporalQ",
    "Rules": "ExtRelationalQ", "Scrub": "ExtRelationalQ",
    "Scd": "ExtRelationalQ", "SemiStructured": "ExtRelationalQ",
    "Diff": "ExtRelationalQ", "Joins": "ExtRelationalQ",
    "Skew": "ExtRelationalQ",
}
def classify(qlines):
    body = "\n".join(qlines)
    counts = {}
    for op, fam in FAMILY_OF_OP.items():
        n = len(re.findall(rf"\b{op}\.", body))
        if n:
            counts[fam] = counts.get(fam, 0) + n
    if not counts:
        return "ExtRelationalQ"
    return max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]

families = {}
for qnum in sorted(queries):
    fam = classify(queries[qnum])
    families.setdefault(fam, []).append(qnum)

# ---- emit ----------------------------------------------------------------
os.makedirs(OUTDIR, exist_ok=True)
imports = [l for l in header if l.startswith("import") or l == ""]
import_blob = "\n".join(
    ["package graft.queries", ""] +
    [l for l in header if l.startswith("import")])

def widen_private(ls):
    return [re.sub(r"^  private (val|def|lazy)",
                   r"  private[queries] \1", l) for l in ls]

with open(f"{OUTDIR}/ExtHelpers.scala", "w") as f:
    f.write(import_blob + "\n\n")
    f.write("/** Shared private helpers of the [[Ext]] registry — the\n"
            "  * portable-hash constants and DuckDB oracle CTE fragments\n"
            "  * every family trait builds on. Split from the monolithic\n"
            "  * Ext.scala in round 12 (pure relocation). */\n")
    f.write("private[queries] trait ExtHelpers {\n")
    for h in helpers:
        f.write("\n".join(widen_private(h)) + "\n\n")
    f.write("}\n")

FAMDOC = {
    "ExtDedupQ": "exact/near-dup dedup (MinHash-LSH, SimHash, Jaccard, winnowing, spans, fuzzy matching)",
    "ExtTextQ": "text analysis (language-ID, quality, tokens, fingerprints, n-gram stats)",
    "ExtSimilarityQ": "embedding similarity / ANN (brute-force, IVF, RP-LSH, PQ) and retrieval evals",
    "ExtSketchQ": "bounded-state sketches (CMS, HLL, grid percentile) and their accuracy evals",
    "ExtSamplingQ": "sampling, mixing, splits and sequence packing",
    "ExtMultimodalQ": "multimodal binary-column plumbing and decode",
    "ExtProfilingQ": "profiling, drift and distribution diagnostics",
    "ExtTemporalQ": "temporal/trend/cohort readouts over events and orders",
    "ExtRelationalQ": "relational breadth (joins, rules, scrubbing, SCD, semi-structured, misc)",
}
for fam, qnums in sorted(families.items()):
    with open(f"{OUTDIR}/{fam}.scala", "w") as f:
        f.write(import_blob + "\n\n")
        f.write(f"/** [[Ext]] family: {FAMDOC[fam]} — queries "
                f"{', '.join('q%d' % n for n in qnums)}.\n"
                "  * Split from the monolithic Ext.scala in round 12\n"
                "  * (pure relocation; helpers live in [[ExtHelpers]]). */\n")
        f.write(f"private[queries] trait {fam} {{ self: ExtHelpers =>\n")
        for n in qnums:
            f.write("\n".join(queries[n]) + "\n\n")
        f.write("}\n")

# rewritten Ext.scala: header scaladoc + object extending the traits
obj_doc_start = next(i for i, l in enumerate(header) if l.startswith("/**"))
with open(SRC, "w") as f:
    f.write("\n".join(header[:obj_doc_start]) + "\n")
    f.write("\n".join(header[obj_doc_start:]) + "\n")
    fams = " with ".join(sorted(families))
    f.write(f"object Ext extends ExtHelpers\n    with {fams} {{\n\n")
    f.write("\n".join(tail) + "\n")

print("families:")
for fam, qnums in sorted(families.items()):
    print(f"  {fam}: {len(qnums)} queries")
print(f"helpers: {len(helpers)}")
