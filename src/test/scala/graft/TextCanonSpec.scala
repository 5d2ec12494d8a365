package graft

import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize
import org.apache.spark.sql.graft.ColumnBridge

/** tx18 (NFC normalization) and dd16 (URL canonicalization) semantics. */
class TextCanonSpec extends SparkSpec {

  private def nfc(c: org.apache.spark.sql.Column) =
    ColumnBridge.toColumn(NfcNormalize(ColumnBridge.toExpression(c)))

  test("NFC: composes decomposed sequences, idempotent, identity on ASCII/NFC text") {
    import spark.implicits._
    val cases = Seq(
      "é",              // e + combining acute -> é
      "àb̂",       // two compositions in one string
      "\u00e9",               // already NFC -> unchanged
      "plain ascii 123",      // identity fast path
      "ó́")        // base + two marks: composes once, keeps the second
    val out = cases.toDF("s").select(nfc(col("s")).as("n")).as[String].collect()
    val expect = cases.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(out.toSeq == expect)
    assert(out(0) == "\u00e9" && out(2) == "\u00e9")
    assert(out(3) == "plain ascii 123")
    // idempotence: nfc(nfc(x)) == nfc(x)
    val twice = cases.toDF("s").select(nfc(nfc(col("s"))).as("n")).as[String].collect()
    assert(twice.toSeq == out.toSeq)
  }

  test("tx18: every decorated doc composes exactly one pair (all 15 vowel-mark pairs precompose)") {
    val df = run("tx18_nfc_normalize")
    assert(df.filter(col("composed") =!= 1).count() == 0)
    assert(df.count() > 0)
  }

  test("dd16: canonicalization is scheme/host-case-, port-, fragment-, utm- and order-insensitive") {
    import spark.implicits._
    // hand-built variants of ONE logical URL must all collapse
    val variants = Seq(
      "HTTP://WWW.Example.COM:80/Docs/?b=2&a=1&utm_source=x#frag",
      "http://example.com/Docs/?a=1&utm_campaign=y&b=2",
      "http://EXAMPLE.com:80/Docs/?b=2&a=1")
    // the SAME Column pipeline the registered query runs — shared
    // helper, so this golden cannot drift from the shipped rules
    val canon = variants.toDF("url")
      .select(graft.operators.DedupOps.canonicalUrl(col("url")).as("c"))
      .distinct().as[String].collect()
    assert(canon.toSeq == Seq("http://example.com/Docs/?a=1&b=2"), canon.toSeq)

    // the scheme is preserved (lowercased), NOT rewritten: the https
    // twin of the same page canonicalizes to a DISTINCT https:// URL
    // (round 12 hardcoded 'http://' and collapsed them), and each
    // scheme strips only ITS default port (:443 stays on http, :80 on
    // https — a nonstandard port is part of the page's identity)
    val schemed = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/?b=2&a=1#f",
      "https://example.com/Docs/?a=1&b=2",
      "http://example.com:443/Docs/?a=1&b=2",
      "https://example.com:80/Docs/?a=1&b=2")
      .toDF("url")
      .select(graft.operators.DedupOps.canonicalUrl(col("url")).as("c"))
      .distinct().as[String].collect().sorted
    assert(schemed.toSeq == Seq(
      "http://example.com:443/Docs/?a=1&b=2",
      "https://example.com/Docs/?a=1&b=2",
      "https://example.com:80/Docs/?a=1&b=2"), schemed.toSeq)

    // and the registered query really deduplicates: fewer canonical
    // pages than documents, counts sum back to the corpus
    val dd = run("dd16_url_canonicalize")
    val docs = run("dd1_exact_dedup").agg(sum("n_copies")).first().getLong(0)
    assert(dd.count() < docs)
    assert(dd.agg(sum("n_dups")).first().getLong(0) == docs)
  }

}
