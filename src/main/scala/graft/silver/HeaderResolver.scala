package graft.silver

import scala.collection.immutable.ListMap

import graft.functions.Locale

/** Fuzzy header resolution — the reference's most distinctive schema
  * feature (transform.py:27-72): physical CSV headers vary between ANP
  * file releases, so logical columns are resolved against NFKD-normalized
  * header names by exact match first, then token-contains fallback
  * chains, with a descriptive error listing every unmappable logical
  * column.
  *
  * Pure driver-side metadata logic over `df.columns` — not a Catalyst
  * concern (SURVEY §2.9); the resolved map feeds a plain
  * `select(col(physical).as(logical))`.
  */
object HeaderResolver {

  /** One resolution step: exact normalized names, or token sets that must
    * all be contained in the normalized header. Steps are tried in order;
    * first hit wins. */
  sealed trait Step
  final case class Exact(names: String*) extends Step
  final case class Contains(tokens: String*) extends Step

  final case class Rule(logical: String, steps: Seq[Step])

  /** The reference's ANP mapping (transform.py:52-63). */
  val AnpRules: Seq[Rule] = Seq(
    Rule("uf_sigla", Seq(Exact("estado sigla"), Contains("estado", "sigla"))),
    Rule("product", Seq(Exact("produto"), Contains("produto"))),
    Rule("date_ref", Seq(Exact("data da coleta"), Contains("data", "coleta"), Contains("data"))),
    Rule("price", Seq(
      Exact("valor de venda"), Contains("valor", "venda"),
      Exact("preco medio revenda"), Contains("preco", "medio"), Contains("preco"))))

  /** Resolve logical -> physical column names. Mirrors the reference's
    * dict semantics: on duplicate normalized names the LAST physical
    * column wins for exact lookup, while contains-iteration follows
    * first-seen header order. Throws with the full missing list
    * (transform.py:65-72). */
  def resolve(physical: Seq[String], rules: Seq[Rule] = AnpRules): Map[String, String] = {
    val normOrder = physical.map(c => Locale.normalizeHeader(c) -> c)
    val exactMap = normOrder.toMap // later duplicates win, like a python dict
    // Python-dict semantics for the contains scan too: iteration follows
    // FIRST-seen insertion order, but a duplicate normalized header
    // overwrites the VALUE in place (LinkedHashMap update keeps the
    // original position) — so contains also returns the LAST physical
    // duplicate, exactly like `{norm(c): c for c in cols}`.
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    normOrder.foreach { case (n, c) => seen(n) = c }

    def tryStep(s: Step): Option[String] = s match {
      case Exact(names @ _*) => names.collectFirst {
        case n if exactMap.contains(n) => exactMap(n)
      }
      case Contains(tokens @ _*) => seen.collectFirst {
        case (nrm, orig) if tokens.forall(nrm.contains) => orig
      }
    }

    val resolved = rules.map(r => r.logical -> r.steps.view.flatMap(tryStep(_)).headOption)
    val missing = resolved.collect { case (logical, None) => logical }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        "Could not automatically map ANP columns. Missing: " + missing.mkString(", ") +
          ". Adjust the resolver rules to match the CSV header.")
    ListMap(resolved.collect { case (logical, Some(physicalCol)) => logical -> physicalCol }: _*)
  }
}
