package graft
import java.nio.file.{Files, Paths}

/** Writes SparkEntry.oracleSql as oracle_sql.json WITHOUT starting Spark or
  * running any query — feeds tools/oracle_types.py, the fast registry
  * integrity gate (DESCRIBE every oracle, assert Spark-typed columns).
  * `sbt "runMain graft.DumpOracle /tmp/oracle"` completes in seconds.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[dump-oracle] ${SparkEntry.oracleSql.size} oracle entries -> $outDir/oracle_sql.json")
  }
}
