#!/usr/bin/env python3
"""Seed/refresh Bench.scala floors from a canonical bench artifact.

Usage: python3 scripts/seed_floors.py <BENCH_local_full_*.json> \
           [--replace q62_x,q305_y,...]

- Adds a time floor for every registry query the artifact measured that
  has no entry yet (annotated as r20 seeds).
- Replaces the time floor for every query named in --replace.
- Adds byte floors for artifact queries missing one; replaces byte
  floors for --replace queries.
Edits src/main/scala/graft/Bench.scala in place; prints a diff summary.
"""
import json
import re
import sys

art_path = sys.argv[1]
replace = set()
if len(sys.argv) > 3 and sys.argv[2] == "--replace":
    replace = set(sys.argv[3].split(","))

art = json.load(open(art_path))
times = art["queries"]          # min seconds per query
byts = art["shuffle_bytes"]    # bytes per query

path = "src/main/scala/graft/Bench.scala"
src = open(path).read()

m = re.search(r"(val floors: Map\[String, Double\] = Map\()(.*?)(\))\n(  private\[graft\] val defaultFloor)", src, re.S)
floors_body = m.group(2)
existing = dict(re.findall(r'"(q\w+)" -> ([\d.]+)', floors_body))

mb = re.search(r"(val byteFloors: Map\[String, Long\] = Map\()(.*?)(\)\n  private\[graft\] val byteFactor)", src, re.S)
bytes_body = mb.group(2)
bexisting = dict(re.findall(r'"(q\w+)" -> (\d+)L', bytes_body))

added_t, replaced_t, added_b, replaced_b = [], [], [], []

# replacements in place — each restricted to its own map's span, so a
# query present in BOTH maps never gets the other map's value (the
# first version of this script corrupted byteFloors exactly that way)
def sub_in_span(source, span_re, entry_re, repl):
    mm = re.search(span_re, source, re.S)
    body = re.sub(entry_re, repl, source[mm.start(2):mm.end(2)])
    return source[:mm.start(2)] + body + source[mm.end(2):]

FLOORS_SPAN = r"(val floors: Map\[String, Double\] = Map\()(.*?)(\)\n  private\[graft\] val defaultFloor)"
BYTES_SPAN = r"(val byteFloors: Map\[String, Long\] = Map\()(.*?)(\)\n  private\[graft\] val byteFactor)"
for q in sorted(replace):
    # re.escape + loud misses (r20, the r19 advice finding): a typo'd
    # --replace name used to produce no edit and no error
    hit = False
    if q in times and q in existing:
        src = sub_in_span(src, FLOORS_SPAN,
                          r'"%s" -> [\d.]+' % re.escape(q),
                          '"%s" -> %.2f' % (q, times[q]))
        replaced_t.append((q, existing[q], times[q]))
        hit = True
    if q in byts and q in bexisting:
        src = sub_in_span(src, BYTES_SPAN,
                          r'"%s" -> \d+L' % re.escape(q),
                          '"%s" -> %dL' % (q, byts[q]))
        replaced_b.append((q, bexisting[q], byts[q]))
        hit = True
    if not hit:
        sys.exit("--replace name %r matched nothing: not (in the "
                 "artifact AND in an existing floor map). Check for a "
                 "typo." % q)

# additions: time floors
new_t = {q: t for q, t in times.items() if q not in existing}
if new_t:
    ins = ",\n    // r20 seeds: quiet-host canonical (this artifact's min)\n"
    ins += ",\n".join('    "%s" -> %.2f' % (q, t) for q, t in sorted(new_t.items()))
    src = re.sub(r'(val floors: Map\[String, Double\] = Map\(.*?)(\))\n(  private\[graft\] val defaultFloor)',
                 lambda mm: mm.group(1) + ins + mm.group(2) + "\n" + mm.group(3),
                 src, flags=re.S)
    added_t = sorted(new_t.items())

new_b = {q: b for q, b in byts.items() if q not in bexisting}
if new_b:
    ins = ",\n    // r20 seeds (same canonical)\n"
    ins += ",\n".join('    "%s" -> %dL' % (q, b) for q, b in sorted(new_b.items()))
    src = re.sub(r'(val byteFloors: Map\[String, Long\] = Map\(.*?)(\)\n  private\[graft\] val byteFactor)',
                 lambda mm: mm.group(1) + ins + mm.group(2),
                 src, count=1, flags=re.S)
    added_b = sorted(new_b.items())

open(path, "w").write(src)
print("time floors added:", len(added_t), added_t[:5])
print("time floors replaced:", replaced_t)
print("byte floors added:", len(added_b), added_b)
print("byte floors replaced:", replaced_b)
