package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Registry integrity: `Registry.byName`/`SparkEntry.queries` are built
  * with a last-wins `toMap` (Registry.scala), so a duplicated FULL name
  * would silently drop a gate from the driver set while CORRECTNESS
  * stays green — and a duplicated qNNN prefix (two different full names
  * sharing a number, the r10 q309 collision) compiles and passes with
  * one gate shadowing the other in every human-facing list. Both
  * classes must fail a test, not an audit. */
class RegistrySpec extends AnyFunSuite {

  test("every query name is unique (a duplicate silently drops a gate)") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"duplicate full names: ${dups.mkString(", ")}")
    assert(Registry.byName.size === Registry.all.size)
  }

  test("every qNNN prefix is unique and well-formed") {
    val prefixes = Registry.all.map(_.name.takeWhile(_ != '_'))
    prefixes.foreach { p =>
      assert(p.matches("q[0-9]+[a-z]?"), s"malformed query prefix: $p")
    }
    val dups = prefixes.groupBy(identity).collect {
      case (p, occ) if occ.size > 1 => p
    }
    assert(dups.isEmpty,
      s"colliding numeric prefixes (new gates take the NEXT FREE qNNN): " +
        dups.mkString(", "))
  }

  test("the guards actually fire on a deliberate duplicate") {
    // the hazard the spec exists for: last-wins toMap shrinks the set
    val doubled = Registry.all ++ Registry.all.take(1)
    assert(doubled.map(q => q.name -> q).toMap.size < doubled.size)
  }

  test("QUERIES.md is regenerated (gate names == Registry.all names)") {
    // Generated artifacts drift when a gate lands without regenerating
    // the index (r11 verdict: QUERIES.md said 320 while the registry
    // held 322). Compare NAME SETS, not counts — a simultaneous
    // rename+add (or add+remove) keeps the count equal while the index
    // is stale (advice r12).
    val f = new java.io.File("QUERIES.md")
    assert(f.exists(), "QUERIES.md missing — run tools/gen_queries_md.py")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val rowNames = try src.getLines()
      .filter(_.matches("""^\| q[0-9]+[a-z]?_.*"""))
      .map(_.stripPrefix("| ").takeWhile(_ != ' ').trim).toSet
    finally src.close()
    val regNames = Registry.all.map(_.name).toSet
    val msg = "regenerate: sbt 'runMain graft.Meta' > /tmp/meta.jsonl && " +
      "python3 tools/gen_queries_md.py /tmp/meta.jsonl > QUERIES.md"
    assert((regNames -- rowNames).isEmpty,
      s"QUERIES.md missing gates ${(regNames -- rowNames).toSeq.sorted.take(5)} — $msg")
    assert((rowNames -- regNames).isEmpty,
      s"QUERIES.md has stale rows ${(rowNames -- regNames).toSeq.sorted.take(5)} — $msg")
  }

  test("PLANS.md is regenerated (plan headers == benched gate names)") {
    // The plan book was the one generated artifact refreshed only by
    // convention (verdict r12 task 8) — pin its NAME SET to the
    // bench=true gates the same way QUERIES.md is pinned. Content
    // staleness is still a judgement call (plans change legitimately),
    // but a benched gate added/renamed without a regen now fails a test.
    val f = new java.io.File("PLANS.md")
    assert(f.exists(), "PLANS.md missing — run graft.Explain")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val headers = try src.getLines()
      .filter(_.startsWith("========== "))
      .map(_.stripPrefix("========== ").stripSuffix(" ==========").trim)
      .toSet
    finally src.close()
    val benched = Registry.all.filter(_.bench).map(_.name).toSet
    val msg = "regenerate: SPARK_GRAFT_CPUS=4 sbt -batch " +
      "\"runMain graft.Explain /root/testdata/sf0.001 PLANS.md\""
    assert((benched -- headers).isEmpty,
      s"PLANS.md missing plans ${(benched -- headers).toSeq.sorted.take(5)} — $msg")
    assert((headers -- benched).isEmpty,
      s"PLANS.md has stale plans ${(headers -- benched).toSeq.sorted.take(5)} — $msg")
  }
}
