package graft

import graft.silver.HeaderResolver

class HeaderResolverSpec extends SparkSpec {

  test("resolves the standard ANP header by exact normalized match") {
    val m = HeaderResolver.resolve(Seq(
      "Regiao - Sigla", "Estado - Sigla", "Municipio", "Produto",
      "Data da Coleta", "Valor de Venda", "Valor de Compra", "Unidade de Medida"))
    assert(m == Map(
      "uf_sigla" -> "Estado - Sigla", "product" -> "Produto",
      "date_ref" -> "Data da Coleta", "price" -> "Valor de Venda"))
  }

  test("falls back through the price chain to accented 'Preço Médio Revenda'") {
    val m = HeaderResolver.resolve(Seq(
      "Estado - Sigla", "Produto", "Data da Coleta", "Preço Médio Revenda"))
    assert(m("price") == "Preço Médio Revenda")
  }

  test("contains fallback matches reordered/partial headers") {
    val m = HeaderResolver.resolve(Seq(
      "Sigla do Estado", "Produto Vendido", "Data", "Preço por Litro"))
    assert(m("uf_sigla") == "Sigla do Estado")
    assert(m("product") == "Produto Vendido")
    assert(m("date_ref") == "Data") // last-resort Contains("data")
    assert(m("price") == "Preço por Litro") // last-resort Contains("preco")
  }

  test("duplicate normalized headers: last value wins at first-seen position") {
    // "Produto" and "PRODUTO " normalize identically — mirrors the
    // reference's python-dict overwrite semantics
    val m = HeaderResolver.resolve(Seq(
      "Estado - Sigla", "Produto", "PRODUTO ", "Data da Coleta", "Valor de Venda"))
    assert(m("product") == "PRODUTO ") // exact lookup: later duplicate wins

    // contains fallback: same dict semantics — the duplicate overwrites
    // the value but keeps the first occurrence's iteration position
    val m2 = HeaderResolver.resolve(Seq(
      "Estado - Sigla", "Produto Vendido", "PRODUTO VENDIDO ",
      "Data da Coleta", "Valor de Venda"))
    assert(m2("product") == "PRODUTO VENDIDO ")
  }

  test("unmappable columns raise a descriptive error listing every miss") {
    val e = intercept[IllegalArgumentException] {
      HeaderResolver.resolve(Seq("Estado - Sigla", "Data da Coleta", "Valor de Venda"))
    }
    assert(e.getMessage.contains("Missing: product"))
  }
}
