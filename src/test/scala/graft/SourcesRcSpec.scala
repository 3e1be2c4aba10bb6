package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}

import graft.sources.ColumnarRowGroupFile
import org.scalatest.funsuite.AnyFunSuite

/** Codec-level checks for the RCFile re-expression: round-trip fidelity,
  * multi-group handling, and the format's defining lazy-column property —
  * a pruned read touches only the wanted columns' bytes. */
class SourcesRcSpec extends AnyFunSuite {

  private def container(groups: Seq[Seq[Array[String]]], nCols: Int): Array[Byte] = {
    val raw = new ByteArrayOutputStream()
    val out = new DataOutputStream(raw)
    out.write(Array[Byte]('G', 'R', 'C', 'F', '1'))
    groups.foreach(g => ColumnarRowGroupFile.writeGroup(out, g, nCols))
    out.flush()
    raw.toByteArray
  }

  private val rows = Seq(
    Array("1", "alpha", "10.5"),
    Array("2", "beta", "20.25"),
    Array("3", "", "0"))

  test("round-trips all columns across multiple row groups") {
    val bytes = container(Seq(rows.take(2), rows.drop(2)), 3)
    val (it, _) = ColumnarRowGroupFile.readGroups(bytes, 3, Seq(0, 1, 2))
    assert(it.map(_.toSeq).toSeq == rows.map(_.toSeq))
  }

  test("column projection returns only wanted columns, in asked order") {
    val bytes = container(Seq(rows), 3)
    val (it, _) = ColumnarRowGroupFile.readGroups(bytes, 3, Seq(2, 0))
    assert(it.map(_.toSeq).toSeq ==
      Seq(Seq("10.5", "1"), Seq("20.25", "2"), Seq("0", "3")))
  }

  test("lazy-column property: pruned read touches only wanted columns' bytes") {
    val bytes = container(Seq(rows), 3)
    // the reader is lazy (one group at a time): consume before reading the
    // byte counter
    val (itAll, tAll) = ColumnarRowGroupFile.readGroups(bytes, 3, Seq(0, 1, 2))
    itAll.size
    val (itOne, tOne) = ColumnarRowGroupFile.readGroups(bytes, 3, Seq(0))
    itOne.size
    val col0Bytes = rows.map(_(0).getBytes("UTF-8").length).sum
    assert(tOne.bytes == col0Bytes.toLong, "skipped columns must not be read")
    assert(tAll.bytes > tOne.bytes)
  }

  test("rejects a non-container payload") {
    val e = intercept[IllegalArgumentException] {
      ColumnarRowGroupFile.readGroups("not a container".getBytes, 1, Seq(0))
    }
    assert(e.getMessage.contains("GRCF1"))
  }

  test("NULL cells survive the round-trip distinct from empty strings") {
    val data = Seq(Array("1", null, ""), Array("2", "x", null))
    val bytes = container(Seq(data), 3)
    val (it, _) = ColumnarRowGroupFile.readGroups(bytes, 3, Seq(0, 1, 2))
    assert(it.map(_.toSeq).toSeq == data.map(_.toSeq),
      "NULL must read back as null, '' as empty string")
  }
}
