package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** All non-ASCII content is built from explicit \\u escape literals --
  * precomposed and decomposed variants are glyph-identical in rendered
  * source, which is exactly the confusion NFC exists to fix.
  */
class TextNormalizeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import NfcNormalize.nfc

  private val pre = "Caf" + "\u00e9"  // precomposed e-acute, 4 codepoints
  private val dec = "Cafe" + "\u0301" // e + combining acute, 5 codepoints

  test("NFC composes combining sequences; precomposed and ASCII pass through") {
    val df = Seq(dec, pre, "plain ascii", "A" + "\u030a").toDF("s")
    val out = df.select(nfc($"s").as("n"), length(nfc($"s")).as("l"))
      .as[(String, Int)].collect()
    assert(out(0) == ((pre, 4)))
    assert(out(1) == ((pre, 4)))
    assert(out(2) == (("plain ascii", 11)))
    assert(out(3) == (("\u00c5", 1))) // A + ring -> precomposed A-ring
  }

  test("null propagates; equality after NFC unifies encoding variants") {
    val df = Seq(Some("e" + "\u0301"), None).toDF("s")
    val got = df.select(nfc($"s")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) == "\u00e9" && got(1) == null)
    // the dedup-visible property: hashes agree after normalization
    val hashes = Seq(pre + " x", dec + " x").toDF("s")
      .select(sha2(nfc($"s"), 256)).distinct().count()
    assert(hashes == 1)
  }

  test("expression output matches the JDK normalizer (drift guard)") {
    val vals = Seq(dec, "\u00e4b" + "\u0301" + "c", "", "ascii only")
    val viaExpr = vals.toDF("s").select(nfc($"s")).as[String].collect().toSeq
    val viaJdk = vals.map(v =>
      java.text.Normalizer.normalize(v, java.text.Normalizer.Form.NFC))
    assert(viaExpr == viaJdk)
  }
}
