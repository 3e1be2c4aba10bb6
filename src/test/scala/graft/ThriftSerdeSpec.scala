package graft

import graft.sources.ThriftBinarySerde
import graft.sources.ThriftBinarySerde._
import org.apache.spark.sql.SparkSession

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Thrift TBinaryProtocol serde ([[graft.sources.ThriftBinarySerde]]):
  * golden wire bytes (the encoding must match the public TBinaryProtocol
  * strict-struct layout, not merely round-trip with itself), id-based
  * field matching under arbitrary order, structural skip of unprojected
  * and type-diverged fields, NULL fill for missing fields, and the
  * PERMISSIVE corrupt-payload rescue. */
class ThriftSerdeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-thrift")

  override def afterAll(): Unit = spark.stop()

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  test("golden wire bytes match the TBinaryProtocol strict struct layout") {
    // field 1: i64 = 7; field 2: string "AB"; stop
    val b = encode(Seq((1.toShort, I64, 7L), (2.toShort, STRING, "AB")))
    assert(hex(b) ==
      "0a" + "0001" + "0000000000000007" + // I64 type, id 1, big-endian 7
      "0b" + "0002" + "00000002" + "4142" + // STRING type, id 2, len 2, "AB"
      "00") // STOP
    // bool true/false are single bytes 01/00; double is IEEE-754 BE bits
    val b2 = encode(Seq((3.toShort, BOOL, true), (4.toShort, DOUBLE, 1.5)))
    assert(hex(b2) == "02" + "0003" + "01" +
      "04" + "0004" + "3ff8000000000000" + "00")
  }

  private def parseOne(payload: Array[Byte],
      fields: Seq[Field]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val df = Seq(payload).toDF("payload")
    ThriftBinarySerde.parse(df, "payload", fields).head()
  }

  private val proj = Seq(Field(1, I64, "id"), Field(2, STRING, "s"),
    Field(6, LIST, "xs"))

  test("field order does not matter; unprojected and type-diverged fields" +
      " are skipped structurally") {
    val fwd = encode(Seq((1.toShort, I64, 9L), (2.toShort, STRING, "hi"),
      (6.toShort, LIST, Seq(3L, 4L)), (99.toShort, I16, 5.toShort)))
    val rev = encode(Seq((99.toShort, I16, 5.toShort),
      (6.toShort, LIST, Seq(3L, 4L)), (2.toShort, STRING, "hi"),
      (1.toShort, I64, 9L)))
    val (a, b) = (parseOne(fwd, proj), parseOne(rev, proj))
    assert(a == b)
    assert(a.getAs[Long]("id") == 9L && a.getAs[String]("s") == "hi")
    assert(a.getAs[scala.collection.Seq[Long]]("xs").toSeq == Seq(3L, 4L))
    assert(a.getAs[String]("status") == "ok")
    // same id, WRONG wire type: skipped (NULL), not misread
    val diverged = encode(Seq((1.toShort, I32, 9), (2.toShort, STRING, "x")))
    val d = parseOne(diverged, proj)
    assert(d.isNullAt(d.fieldIndex("id")) && d.getAs[String]("s") == "x")
  }

  test("missing projected fields read as NULL (schema-on-read tolerance)") {
    val r = parseOne(encode(Seq((2.toShort, STRING, "only"))), proj)
    assert(r.isNullAt(r.fieldIndex("id")) && r.isNullAt(r.fieldIndex("xs")))
    assert(r.getAs[String]("s") == "only" && r.getAs[String]("status") == "ok")
  }

  test("truncated and garbage payloads rescue as status='corrupt' with" +
      " NULL columns — the row survives") {
    val good = encode(Seq((1.toShort, I64, 9L), (2.toShort, STRING, "hi")))
    for (bad <- Seq(good.dropRight(3), good.dropRight(1),
        Array[Byte](11, 0, 1, 0, 0, 0, 99), // string claiming 99 bytes
        Array[Byte](77, 77, 77))) { // unknown type byte
      val r = parseOne(bad, proj)
      assert(r.getAs[String]("status") == "corrupt", hex(bad))
      assert(r.isNullAt(r.fieldIndex("id")) && r.isNullAt(r.fieldIndex("s")))
    }
  }

  test("nested struct fields skip structurally (depth-recursive)") {
    // outer field 7 is a STRUCT the projection does not want: its body
    // (an i64 + a string + stop) must be skipped as a unit
    val inner = encode(Seq((1.toShort, I64, 1L), (2.toShort, STRING, "in")))
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeByte(STRUCT.toInt); d.writeShort(7)
    d.write(inner) // struct value = its own field list + STOP
    d.writeByte(I64.toInt); d.writeShort(1); d.writeLong(42L)
    d.writeByte(STOP.toInt)
    val r = parseOne(out.toByteArray, proj)
    assert(r.getAs[Long]("id") == 42L && r.getAs[String]("status") == "ok")
  }
}
