package graft

import org.apache.spark.sql.functions._

/** Degenerate-input sweep over the ENTIRE registered query surface
  * (the r17 verification-depth round): every `SparkEntry.queries`
  * entry must COMPLETE — not throw — on schema-valid but extreme
  * corpora. The ADVICE r16 finds (q194's `.head()` on a missing seed
  * row, q193's null-alt rows on a single-label corpus) were exactly
  * this bug class; this sweep hunts the remaining instances
  * wholesale instead of one advisory at a time.
  *
  * Two fixtures, both derived from the real sf0.001 tables (schema
  * exactness for free — the sentinel's canonical schema is whatever
  * the driver wrote, including the events.ts era):
  *  - `tiny`:  3 rows per table — empty groups, empty joins, empty
  *    probe sets, sub-k corpora everywhere;
  *  - `mono`:  one document source, one embedding label, one event
  *    type — every cross-source/cross-label/cross-type query's
  *    "other side" is empty.
  *
  * The contract is completion + a sane row count (≥ 0 — i.e. the
  * plan executes), NOT value agreement (the sf0.01 oracle gate owns
  * values); a query that legitimately needs more data must degrade
  * to empty output, never to an exception, because at 100 TB a
  * partition-local slice of ANY operator can be this sparse.
  *
  * Cross-engine agreement is a COMMITTED gate since r18
  * (`scripts/degen_check.py` over the same [[graft.MakeDegen]]
  * recipes → `CORRECTNESS_DEGEN.json`): tiny/mono/emptydocs each
  * read 187 MATCH + 2 rows-only of 191. r18 closed the r17 residuals
  * by COMPUTING the SQL-expressible audit witnesses instead of
  * pinning them (`audit_nonempty`/`recall_ok` from their slice
  * predicates; q145's via the slice-restricted q131 CTE), aligning
  * the empty-string fingerprint boundary (DuckDB `unicode('')` = -1
  * vs the Spark fold's 0), and vacuous-truth-coalescing the
  * q33/q34/q35/q43/q52/q96 theorem aggregates. r19 closed the last
  * residual pair: q44/q145 `has_pairs` now binds exactly where each
  * exhaustive audit proves pairs exist (found_pairs OR NOT
  * audit-nonempty) and goes structurally vacuous on degenerate
  * corpora — all three recipes read 190 MATCH + 2 rows-only with an
  * empty non_match map.
  * Real divergences this program has found and fixed: q101's oracle
  * collapsing to zero rows on an empty encode sample, q44's vacuous
  * bool_and, the q150/q191 NULL corpus-stats sums (r17); q189
  * rejecting its own just-built 0-row vocab artifact (masked until
  * the refusal filter was tightened) and the fingerprint
  * empty-string boundary (r18). */
class DegenerateCorpusSpec extends SparkSpec {

  // recipes live in main ([[graft.MakeDegen]]) — the committed
  // cross-engine gate (scripts/degen_check.py → CORRECTNESS_DEGEN
  // .json) derives THE SAME fixtures, so spec and gate cannot drift
  private def derive(name: String): String = MakeDegen.derive(spark, sf,
    java.nio.file.Files.createTempDirectory(s"graft_degen_$name").toString, name)

  private lazy val tinyDir = derive("tiny")

  private lazy val monoDir = derive("mono")

  private def sweep(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        assert(n >= 0)
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" / ").take(200)}")
      }
    }

  test("every registered query completes on a 3-row corpus (no .head()-on-empty class bugs)") {
    val failures = sweep(tinyDir)
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the tiny corpus:\n${failures.mkString("\n")}")
  }

  test("every registered query completes on a mono-source/mono-label/mono-type corpus") {
    val failures = sweep(monoDir)
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the mono corpus:\n${failures.mkString("\n")}")
  }

  private lazy val emptyDocsDir = derive("emptydocs")

  test("every registered query completes when documents/events are 0-row slices") {
    // the shape a FILTERED slice takes at scale: the table exists,
    // the schema is right, and there is simply nothing in this range.
    // Trainer-style operators over the still-populated embeddings may
    // refuse loudly on EMPTY input only (their documented contract);
    // everything over documents/events must degrade to empty output.
    // match the DOCUMENTED refusal texts exactly (SimilarityQueries
    // "cannot train {IVF centroids,PQ codebooks} on an empty
    // embeddings corpus") — a bare "empty" substring would also mask
    // generic JVM messages for the very bug class this sweep hunts
    // ('head of empty list', 'next on empty iterator', …)
    val failures = sweep(emptyDocsDir)
      .filterNot(_.contains("on an empty embeddings corpus"))
    assert(failures.isEmpty,
      s"${failures.size} queries throw on the empty-docs corpus:\n${failures.mkString("\n")}")
  }
}
