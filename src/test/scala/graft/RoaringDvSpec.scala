package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RoaringDv

/** Pins the deletion-vector bitmap machinery to the PUBLIC formats:
  * the standard roaring serialization is validated BOTH directions
  * against org.roaringbitmap (Spark's own classpath copy — an
  * independent implementation of RoaringFormatSpec), the Z85 codec
  * against the published ZeroMQ test vector, and the DV file framing
  * against itself plus corruption cases. */
class RoaringDvSpec extends AnyFunSuite {

  private def rbSerialize(values: Array[Int], runOptimize: Boolean): Array[Byte] = {
    val rb = org.roaringbitmap.RoaringBitmap.bitmapOf(values: _*)
    if (runOptimize) rb.runOptimize()
    val buf = ByteBuffer.allocate(rb.serializedSizeInBytes())
      .order(ByteOrder.LITTLE_ENDIAN)
    rb.serialize(buf)
    buf.array()
  }

  private def payloadOf(bitmaps: Seq[Array[Byte]]): Array[Byte] = {
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(1681511377).putLong(bitmaps.size.toLong)
    head.array() ++ bitmaps.flatten
  }

  test("org.roaringbitmap serialize -> our parse: array, bitmap and run containers") {
    val rnd = new scala.util.Random(7)
    // array containers (sparse), bitmap containers (dense block),
    // run containers (contiguous ranges + runOptimize)
    val sparse = Array.fill(3000)(rnd.nextInt(1 << 20)).distinct
    val dense = (100000 until 110000).toArray // >4096 in two 16-bit blocks
    val runs = ((5000 until 5600) ++ (70000 until 70100) ++ Seq(9)).toArray
    for ((vals, ro) <- Seq((sparse, false), (dense, false), (runs, true),
        (sparse ++ dense ++ runs, true))) {
      val dv = RoaringDv.parse(payloadOf(Seq(rbSerialize(vals, ro))))
      assert(dv.cardinality == vals.distinct.length.toLong)
      vals.foreach(v => assert(dv.contains(v.toLong), s"missing $v"))
      // negatives: probe values next to members
      vals.take(500).foreach { v =>
        val probe = v + 1
        assert(dv.contains(probe.toLong) == vals.contains(probe))
      }
      assert(!dv.contains(1L << 32)) // outside the single 32-bit bitmap
    }
  }

  test("our serialize -> org.roaringbitmap deserialize (and our own parse)") {
    val rnd = new scala.util.Random(11)
    val vals = (Array.fill(2000)(rnd.nextLong(1L << 21).abs) ++
      (200000L until 206000L)).distinct // array + bitmap containers
    val payload = RoaringDv.serialize(vals)
    // our own parse round trip
    val dv = RoaringDv.parse(payload)
    assert(dv.cardinality == vals.length.toLong)
    vals.foreach(v => assert(dv.contains(v)))
    assert(!dv.contains(vals.max + 1))
    // independent consumer: skip magic+count, feed the 32-bit bitmap
    // to org.roaringbitmap
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == 1681511377)
    assert(bb.getLong == 1L)
    val rb = new org.roaringbitmap.RoaringBitmap()
    rb.deserialize(bb)
    assert(rb.getLongCardinality == vals.length.toLong)
    vals.foreach(v => assert(rb.contains(v.toInt)))
  }

  test("multi-bitmap (64-bit) values split on the 2^32 boundary") {
    val vals = Array(0L, 5L, (1L << 32) + 7L, (1L << 33) + 1L)
    val dv = RoaringDv.parse(RoaringDv.serialize(vals))
    assert(dv.cardinality == 4)
    vals.foreach(v => assert(dv.contains(v)))
    assert(!dv.contains(7L) && !dv.contains((1L << 32) + 5L))
  }

  test("z85 codec: published ZeroMQ vector, round trips, invalid input loud") {
    // the RFC 32/Z85 spec's test case
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(RoaringDv.z85Encode(bytes) == "HelloWorld")
    assert(RoaringDv.z85Decode("HelloWorld").toSeq == bytes.toSeq)
    val rnd = new scala.util.Random(3)
    (1 to 20).foreach { _ =>
      val b = Array.fill(4 * (1 + rnd.nextInt(8)))(rnd.nextInt().toByte)
      assert(RoaringDv.z85Decode(RoaringDv.z85Encode(b)).toSeq == b.toSeq)
    }
    intercept[IllegalArgumentException](RoaringDv.z85Decode("abc"))
    intercept[IllegalArgumentException](RoaringDv.z85Decode("ab~de"))
    // uuid path round trip
    val u = java.util.UUID.randomUUID()
    assert(RoaringDv.relativeDvPath(RoaringDv.encodeDvPath(u)) ==
      s"deletion_vector_$u.bin")
    assert(RoaringDv.relativeDvPath(RoaringDv.encodeDvPath(u, "ab")) ==
      s"ab/deletion_vector_$u.bin")
  }

  test("DV file framing: round trip, offsets independent, corruption loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv").toString
    val p1 = RoaringDv.serialize(Array(1L, 2L, 99L))
    val p2 = RoaringDv.serialize((0L until 5000L).toArray)
    val offs = RoaringDv.writeFile(s"$dir/d.bin", Seq(p1, p2))
    assert(offs.size == 2 && offs.head._1 == 1) // version byte first
    // read back in reverse order (offsets are random-access)
    val b2 = RoaringDv.readFromFile(s"$dir/d.bin", offs(1)._1, offs(1)._2)
    val b1 = RoaringDv.readFromFile(s"$dir/d.bin", offs(0)._1, offs(0)._2)
    assert(b1.toSeq == p1.toSeq && b2.toSeq == p2.toSeq)
    assert(RoaringDv.parse(b2).cardinality == 5000)
    // wrong declared size is loud
    intercept[IllegalArgumentException](
      RoaringDv.readFromFile(s"$dir/d.bin", offs(0)._1, offs(0)._2 + 1))
    // flipped payload byte fails the CRC check
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/d.bin"))
    raw(offs(0)._1 + 4 + 5) = (raw(offs(0)._1 + 4 + 5) ^ 0x40).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.bin"), raw)
    val e = intercept[IllegalArgumentException](
      RoaringDv.readFromFile(s"$dir/c.bin", offs(0)._1, offs(0)._2))
    assert(e.getMessage.contains("checksum"))
  }

  test("serializeBuckets == serialize byte-for-byte (agg path parity)") {
    val rnd = new scala.util.Random(11)
    // sparse (array containers), dense (bitmap containers), multi-
    // bucket 64-bit values with a GAP bucket, and empty
    val sparse = Array.fill(2000)(rnd.nextInt(1 << 22).toLong).distinct
    val dense = (200000L until 220000L).toArray
    val high = Array(0L, 5L, (2L << 32) + 7, (2L << 32) + 99999) // bucket 1 empty
    for (vals <- Seq(sparse, dense, sparse ++ dense, high, Array.empty[Long])) {
      val expect = RoaringDv.serialize(vals)
      val buckets = new java.util.TreeMap[Integer, org.roaringbitmap.RoaringBitmap]()
      vals.foreach { v =>
        val k = Integer.valueOf((v >>> 32).toInt)
        var bm = buckets.get(k)
        if (bm == null) { bm = new org.roaringbitmap.RoaringBitmap(); buckets.put(k, bm) }
        bm.add(v.toInt)
      }
      val (payload, card) = RoaringDv.serializeBuckets(buckets)
      assert(card == vals.distinct.length.toLong)
      assert(java.util.Arrays.equals(payload, expect),
        s"payload mismatch at n=${vals.length}")
      // and it parses back to the same membership
      val dv = RoaringDv.parse(payload)
      vals.foreach(v => assert(dv.contains(v)))
    }
  }
}
