package graft

import graft.operators.TextFeatures
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the compiled text kernels (SURVEY.md §5 plan:
  * ScalaCheck over expression semantics). The cross-engine-critical
  * properties are h60's exact md5-prefix formula and round6's HALF_UP
  * agreement with BigDecimal; structural properties pin shingle/winnow/
  * minhash behavior across arbitrary inputs. */
object KernelPropertiesSpec extends Properties("TextFeatures") {

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  property("h60 equals BigInteger parse of md5-hex prefix") = forAll(text) { s =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexStr = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    TextFeatures.h60(s) == new java.math.BigInteger(hexStr.take(15), 16).longValue()
  }

  property("h60 is within 60 bits and non-negative") = forAll(text) { s =>
    val h = TextFeatures.h60(s)
    h >= 0L && h < (1L << 60)
  }

  property("shingles3: empty below 3 words, else at most n-2 distinct") =
    forAll(Gen.listOf(word)) { ws =>
      val g = TextFeatures.shingles3(ws.toArray)
      if (ws.length < 3) g.isEmpty
      else g.length <= ws.length - 2 && g.distinct.length == g.length
    }

  property("identical shingle sets give identical minhash signatures") =
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      val g = TextFeatures.shingles3((ws ++ ws ++ ws).toArray)
      TextFeatures.minhashSig(g, 64).toSeq ==
        TextFeatures.minhashSig(g.reverse, 64).toSeq
    }

  property("minhash signature entries differ across permutations (non-degenerate)") =
    forAll(Gen.listOfN(8, word).suchThat(_.distinct.size >= 4)) { ws =>
      val g = TextFeatures.shingles3((ws ++ ws.reverse ++ ws).toArray)
      val sig = TextFeatures.minhashSig(g, 64)
      g.isEmpty || sig.distinct.length > 1
    }

  property("winnow output is a subset of the distinct grams") =
    forAll(Gen.listOf(Gen.long)) { gs =>
      val fp = TextFeatures.winnow(gs.toArray, 4)
      fp.toSet.subsetOf(gs.toSet) &&
        (gs.isEmpty || fp.nonEmpty) && fp.distinct.length == fp.length
    }

  property("simhash of a permuted document is unchanged (bag semantics)") =
    forAll(Gen.nonEmptyListOf(word)) { ws =>
      TextFeatures.simhash60(ws.toArray) ==
        TextFeatures.simhash60(scala.util.Random.shuffle(ws).toArray)
    }

  property("round6 equals BigDecimal HALF_UP at scale 6") =
    forAll(Gen.chooseNum(-1e6, 1e6)) { d =>
      TextFeatures.round6(d) ==
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  property("codepoint counters agree with regex-based counts") = forAll(text) { s =>
    val punct = s.replaceAll("[a-z0-9 ]", "").length
    val nonAscii = s.replaceAll("[ -~]", "").length
    TextFeatures.punctCount(s) == punct && TextFeatures.nonAsciiCount(s) == nonAscii
  }
}
