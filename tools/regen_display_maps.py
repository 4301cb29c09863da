#!/usr/bin/env python3
"""Regenerate the README display-name mapping table and bench_keymap.json's
CURRENT-round section from Bench.displayAbbrev (the code map is the source
of truth; BenchLineSpec asserts both artifacts equal it).

Usage: python3 tools/regen_display_maps.py rN
The round label comes from argv — NEVER hardcoded (the r12 regen ran with a
hardcoded "r11" and overwrote the r11 record's map in place; the true
wave-5 map had to be restored from git history). Writing a round OLDER
than the newest entry already in bench_keymap.json is refused outright:
prior rounds' maps are immutable history that joins their BENCH_r{N}.json
display keys back to registry names. Re-running for the newest/current
round is fine (registrations land in waves within a round).

Splices ONLY the wrapped README mapping block: everything between the
marker line "  The current (round-N) mapping:" and the first subsequent
line that starts a new top-level bullet ("- ").  (The r10 lesson: a
find("\n\n") splice swallowed following bullets because the block has no
trailing blank line.) The marker's round number is rewritten to argv's.
"""
import json
import re
import sys
import textwrap

if len(sys.argv) != 2 or not re.fullmatch(r"r\d+", sys.argv[1]):
    sys.exit("usage: regen_display_maps.py rN   (e.g. r13)")
ROUND = sys.argv[1]

km = json.load(open("bench_keymap.json"))
newest = max(km["displayAbbrev"], key=lambda r: int(r[1:]))
if int(ROUND[1:]) < int(newest[1:]):
    sys.exit("refusing to overwrite prior round %s's map (newest is %s): "
             "old rounds join their BENCH_r{N}.json keys and are immutable"
             % (ROUND, newest))

src = open("src/main/scala/graft/Bench.scala").read()
block = src[src.index("displayAbbrev = Map("):]
block = block[: block.index(")\n\n")]
# codes are 1-2 chars from the alnum + wave-11 punctuation space — match
# anything but a quote (a quote can't be a code: it would need escaping
# in both the Scala literal and the JSON key)
amap = dict(re.findall(r'"([a-z0-9_]+)" -> "([^"]+)"', block))
assert len(amap) > 100, len(amap)

pairs = ", ".join("`%s`→`%s`" % (k, v) for k, v in sorted(amap.items()))
body = textwrap.fill(pairs + ".", width=68, initial_indent="  ",
                     subsequent_indent="  ") + "\n"

readme = open("README.md").read()
marker_re = re.compile(r"^  The current \(round-\d+\) mapping:\n", re.M)
m = marker_re.search(readme)
assert m, "README marker line not found"
new_marker = "  The current (round-%s) mapping:\n" % ROUND[1:]
start = m.end()
rest = readme[start:]
end = start + re.search(r"^- ", rest, re.M).start()
open("README.md", "w").write(
    readme[:m.start()] + new_marker + body + readme[end:])

km["displayAbbrev"][ROUND] = amap
json.dump(km, open("bench_keymap.json", "w"), indent=1, sort_keys=True)
print("regenerated %s: %d entries" % (ROUND, len(amap)))
