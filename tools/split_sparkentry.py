#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala's two 509-entry maps into
query modules under graft.queries with a registry, no behavior change."""
import re, os

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT = "src/main/scala/graft/queries"
lines = open(SRC).read().split("\n")  # 0-indexed


def find(pred, start=0, end=None):
    for i in range(start, end if end is not None else len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found from {start}")


obj_open = find(lambda l: l == "object SparkEntry {")
qmap_open = find(lambda l: l.startswith("  def queries: Map"))
qmap_close = find(lambda l: l == "  )", qmap_open)
omap_def = find(lambda l: l.startswith("  def oracleSql: Map"))
omap_open = find(lambda l: l == "    Map(", omap_def)
omap_close = find(lambda l: l == "    )", omap_open)
oblock_close = find(lambda l: l == "  }", omap_close)

# entry stays in SparkEntry; embedSearch moves to QueryHelpers (q32 uses it)
entry_def = find(lambda l: l.startswith("  def entry(spark"))
eb = entry_def
while lines[eb - 1].lstrip().startswith(("/**", "*", "*/")) or not lines[eb - 1].strip():
    eb -= 1
embed_def = find(lambda l: l.startswith("  private def embedSearch"))
emb = embed_def
while lines[emb - 1].lstrip().startswith(("/**", "*", "*/")) or not lines[emb - 1].strip():
    emb -= 1
embed_close = find(lambda l: l == "  }", embed_def)

front_a = lines[obj_open + 1:eb]          # helpers before entry scaladoc
entry_block = lines[eb:emb]               # entry def only
embed_block = lines[emb:embed_close + 1]  # embedSearch -> QueryHelpers
front_b = lines[embed_close + 1:qmap_open]
annot = lines[qmap_close + 1:omap_def]    # AnnotatorPanel etc.
olocals = lines[omap_def + 1:omap_open]   # block locals
trailing = lines[oblock_close + 1:len(lines) - 2 + 1]  # after oracleSql block, before final }
# trim trailing final '}' if captured
while trailing and trailing[-1].strip() in ("}", ""):
    trailing.pop()

header = lines[:obj_open]  # package/imports/scaladoc of object


def split_entries(lo, hi, start_re, comment_indent):
    starts = [i for i in range(lo + 1, hi) if re.match(start_re, lines[i])]
    begins = []
    for sidx in starts:
        b = sidx
        while b - 1 > lo and (not lines[b - 1].strip() or
                              lines[b - 1].startswith(comment_indent + "//")):
            b -= 1
        begins.append(b)
    out = []
    for j, sidx in enumerate(starts):
        end = begins[j + 1] if j + 1 < len(starts) else hi
        key = re.match(start_re, lines[sidx]).group(1)
        text = "\n".join(lines[begins[j]:end]).rstrip()
        if text.endswith(","):
            text = text[:-1]
        out.append((key, text))
    return out


builders = split_entries(qmap_open, qmap_close,
                         r'^    "(q\d+_\w+)" -> ', "    ")
oracles = split_entries(omap_open, omap_close,
                        r'^      "(q\d+_\w+)" ->', "      ")
assert len(builders) == 509 and len(oracles) == 509, (len(builders), len(oracles))
bmap = dict(builders)
omap = dict(oracles)
assert len(bmap) == 509 and len(omap) == 509
assert set(bmap) == set(omap) | (set(bmap) - set(omap))

def qnum(k):
    return int(re.match(r"q(\d+)", k).group(1))

keys = sorted(bmap, key=lambda k: (qnum(k), k))

# greedy pack into modules by total line budget
BUDGET = 2200
modules = []
cur, cur_lines = [], 0
for k in keys:
    n = bmap[k].count("\n") + omap.get(k, "").count("\n") + 4
    if cur and cur_lines + n > BUDGET:
        modules.append(cur)
        cur, cur_lines = [], 0
    cur.append(k)
    cur_lines += n
if cur:
    modules.append(cur)

os.makedirs(OUT, exist_ok=True)

MOD_IMPORTS = """
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators._
import graft.pipeline.Embedder
import QueryHelpers._
import OracleHelpers._
"""

mod_names = []
for mod in modules:
    a, b = qnum(mod[0]), qnum(mod[-1])
    name = f"Queries{a:03d}to{b:03d}"
    mod_names.append(name)
    body_q = ",\n\n".join(bmap[k] for k in mod)
    body_o = ",\n\n".join(omap[k] for k in mod if k in omap)
    with open(f"{OUT}/{name}.scala", "w") as f:
        f.write(f"""package graft
package queries
{MOD_IMPORTS}
/** Query builders + DuckDB oracles q{a:03d}-q{b:03d}, split verbatim from
  * SparkEntry (see its scaladoc for the oracle-parity contract; NOTES.md
  * for the hash/decimal replay rules). */
private[graft] object {name} extends QueryModule {{
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

{body_q}
  )

  def oracleSql: Map[String, String] = Map(

{body_o}
  )
}}
""")

def deprivatize(ls):
    out = []
    for l in ls:
        l = re.sub(r"^(\s*)private (def|val|lazy val) ", r"\1\2 ", l)
        out.append(l)
    return out

# QueryHelpers: front helpers + AnnotatorPanel
with open(f"{OUT}/QueryHelpers.scala", "w") as f:
    f.write("""package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.pipeline.Embedder

/** Shared builder-side helpers for the query modules (split verbatim from
  * SparkEntry): table readers, the events timestamp shim, decimal-exact
  * sums, the per-JVM scratch token, and the memoized persisted kNN-graph
  * store every graph-analytics query serves from. */
private[graft] object QueryHelpers {
""" + "\n".join(deprivatize(front_a)) + "\n\n" +
            "\n".join(deprivatize(embed_block)) + "\n\n" +
            "\n".join(deprivatize(annot)) + "\n}\n")

# OracleHelpers: block locals + trailing oracle builders
with open(f"{OUT}/OracleHelpers.scala", "w") as f:
    f.write("""package graft
package queries

import QueryHelpers._

/** Shared oracle-side SQL fragments and builders (split verbatim from
  * SparkEntry's oracleSql block locals and trailing private defs). */
private[graft] object OracleHelpers {
""" + "\n".join(deprivatize(olocals)) + "\n\n" +
            "\n".join(deprivatize(trailing)) + "\n}\n")

# Registry
with open(f"{OUT}/QueryRegistry.scala", "w") as f:
    mods = ",\n    ".join(mod_names)
    f.write(f"""package graft
package queries

import org.apache.spark.sql.{{DataFrame, SparkSession}}

/** One family module = one slice of the driver contract: its query
  * builders and their DuckDB oracles, keyed identically. */
private[graft] trait QueryModule {{
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}}

/** The registry SparkEntry serves from — concatenation preserves the
  * single-map semantics the driver contract had when SparkEntry held all
  * 509 entries inline (keys are globally unique; CORRECTNESS gates every
  * one). */
private[graft] object QueryRegistry {{
  val modules: Seq[QueryModule] = Seq(
    {mods})
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_.queries).reduce(_ ++ _)
  lazy val oracleSql: Map[String, String] =
    modules.iterator.map(_.oracleSql).reduce(_ ++ _)
}}
""")

# New SparkEntry
with open(SRC, "w") as f:
    f.write("\n".join(header) + "\nobject SparkEntry {\n\n" +
            "  import graft.queries.QueryHelpers.embedSearch\n\n" +
            "\n".join(entry_block) + "\n" +
            ("\n".join(front_b) + "\n" if any(x.strip() for x in front_b) else "") + """
  /** One `queries` entry per implemented operator (SURVEY.md §2 +
    * COVERAGE.md), served from the per-family modules under
    * `graft.queries` (QueryRegistry concatenates them; keys unique,
    * every entry CORRECTNESS-gated). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryRegistry.queries

  /** DuckDB-equivalent SQL per query, same keys as [[queries]]. */
  def oracleSql: Map[String, String] =
    graft.queries.QueryRegistry.oracleSql
}
""")
print("modules:", len(mod_names))
for n in mod_names:
    print(" ", n)
