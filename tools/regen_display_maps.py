#!/usr/bin/env python3
"""Regenerate the README display-name mapping table and bench_keymap.json's
current-round section from Bench.displayAbbrev (the code map is the source
of truth; BenchLineSpec asserts both artifacts equal it).

Splices ONLY the wrapped mapping block: everything between the literal
marker line "  The current (round-11) mapping:" and the first subsequent
line that starts a new top-level bullet ("- ").  (The r10 lesson: a
find("\n\n") splice swallowed following bullets because the block has no
trailing blank line.)
"""
import json
import re
import textwrap

ROUND = "r11"
MARKER = "  The current (round-11) mapping:\n"

src = open("src/main/scala/graft/Bench.scala").read()
block = src[src.index("displayAbbrev = Map("):]
block = block[: block.index(")\n\n")]
amap = dict(re.findall(r'"([a-z0-9_]+)" -> "([a-z0-9_]+)"', block))
assert len(amap) > 100, len(amap)

pairs = ", ".join("`%s`→`%s`" % (k, v) for k, v in sorted(amap.items()))
body = textwrap.fill(pairs + ".", width=68, initial_indent="  ",
                     subsequent_indent="  ") + "\n"

readme = open("README.md").read()
start = readme.index(MARKER) + len(MARKER)
rest = readme[start:]
end = start + re.search(r"^- ", rest, re.M).start()
open("README.md", "w").write(readme[:start] + body + readme[end:])

km = json.load(open("bench_keymap.json"))
km["displayAbbrev"][ROUND] = amap
json.dump(km, open("bench_keymap.json", "w"), indent=1, sort_keys=True)
print("regenerated: %d entries" % len(amap))
