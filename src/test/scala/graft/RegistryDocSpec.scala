package graft

import org.scalatest.funsuite.AnyFunSuite

/** docs/REGISTRY.md is GENERATED from the registry (RegistryDoc) and
  * must stay in sync with it: a query added, renamed, or dropped
  * without regenerating the manifest fails here — the registry-hygiene
  * gate VERDICT r8 #8 asked for. Pure JVM, no SparkSession. */
class RegistryDocSpec extends AnyFunSuite {

  test("docs/REGISTRY.md matches the registry (regenerate with `runMain graft.RegistryDoc`)") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("docs/REGISTRY.md"))
    val expected = RegistryDoc.render()
    assert(committed == expected,
      "docs/REGISTRY.md is stale — run `sbt \"runMain graft.RegistryDoc\"` and commit")
  }

  test("manifest covers every registered query exactly once") {
    val rendered = RegistryDoc.render()
    Queries.all.foreach { case (name, _) =>
      assert(rendered.contains(s"| $name |"), s"$name missing from manifest")
    }
    val tableRows = rendered.linesIterator.count(_.startsWith("| "))
    // header row + separator live on their own lines starting "| #"/"|--"
    assert(tableRows == Queries.all.size + 1, // +1 for the header row
      s"manifest row count $tableRows != registry size ${Queries.all.size} + header")
  }

  test("no module is unresolved and every row carries a summary") {
    val bad = RegistryDoc.render().linesIterator
      .filter(_.matches("\\| \\d+ \\|.*"))
      .filter(l => l.contains("| ? |") || l.endsWith("|  |"))
      .toSeq
    assert(bad.isEmpty, s"rows with unresolved module or empty summary:\n${bad.mkString("\n")}")
  }
}
