package crawlspark.nativejvm

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.udf

/** JVM-native cuckoo-filter fold / delete / probe for the URL-seen
  * sidecar (operators/cuckoo.py; C4/C5 with deletability).
  *
  * Unlike the Bloom OR (BloomFold.scala), cuckoo tables do NOT merge
  * associatively — layout depends on insertion order — so the fold is
  * not a partial-aggregating UDAF. Instead the per-part hash list is
  * gathered JVM-side (sort_array(collect_list(...)) — the same
  * shuffle shape as the Python cogroup) and a scalar UDF applies the
  * sorted sequential insert. Bit-parity with the Python fold is
  * guaranteed by identical slot math and identical order:
  *
  *   fp = (h >>> 48) & 0xFFFF, 0 -> 1
  *   i1 = (h >>> 16) & (nbuckets - 1)   // bits 16+: disjoint from the
  *        pmod(url_hash, n_seen_parts) part selector (low bits) and the
  *        fingerprint (bits 48..63) — a low-bit i1 reaches only
  *        1/n_parts of the buckets under power-of-two part counts
  *   i2 = i1 ^ ((fp * 0x5BD1E995) & (nbuckets - 1))
  *   insert: first free slot of i1 then i2, else evict with victim
  *   slot = kick# mod bucketSize starting at i1; kick budget
  *   exhausted => overflow flag (probe answers all-maybe for the part)
  *
  * and is property-tested from pytest (tests/test_cuckoo.py). What the
  * native path buys over the Python cogroup is the removal of both
  * Arrow round-trips per cycle (fold + probe) — the measured ~18%
  * design-tier gap vs the Bloom sidecar (BENCH/BASELINE.md,
  * "Seen-sidecar flavors").
  *
  * Built offline via tools/build_native.sh; every caller falls back to
  * the Python paths when the jar is absent.
  */
object CuckooFilter {
  private val FPMIX = 0x5BD1E995L
  private var last: Broadcast[Map[Int, (Array[Byte], Int, Int, Boolean)]] = null

  @inline private def fpOf(h: Long): Int = {
    val f = ((h >>> 48) & 0xFFFFL).toInt
    if (f == 0) 1 else f
  }

  @inline private def get16(bits: Array[Byte], slot: Int): Int =
    (bits(2 * slot) & 0xFF) | ((bits(2 * slot + 1) & 0xFF) << 8)

  @inline private def set16(bits: Array[Byte], slot: Int, v: Int): Unit = {
    bits(2 * slot) = (v & 0xFF).toByte
    bits(2 * slot + 1) = ((v >> 8) & 0xFF).toByte
  }

  /** Sequential insert in the given (pre-sorted) order; mutates bits;
    * returns true if any insert exhausted the kick budget. */
  def insertAll(bits: Array[Byte], hashes: Array[Long], nbuckets: Int,
                bucketSize: Int, maxKicks: Int): Boolean = {
    val bmask = (nbuckets - 1).toLong
    var overflow = false
    var n = 0
    while (n < hashes.length) {
      val h = hashes(n)
      var cur = fpOf(h)
      val b1 = ((h >>> 16) & bmask).toInt
      val b2 = b1 ^ ((cur * FPMIX) & bmask).toInt
      var placed = false
      var bi = 0
      while (bi < 2 && !placed) {
        val b = if (bi == 0) b1 else b2
        var s = 0
        while (s < bucketSize && !placed) {
          if (get16(bits, b * bucketSize + s) == 0) {
            set16(bits, b * bucketSize + s, cur); placed = true
          }
          s += 1
        }
        bi += 1
      }
      if (!placed) {
        var b = b1
        var kick = 0
        while (kick < maxKicks && !placed) {
          val s = kick % bucketSize
          val victim = get16(bits, b * bucketSize + s)
          set16(bits, b * bucketSize + s, cur)
          cur = victim
          b = b ^ ((cur * FPMIX) & bmask).toInt
          var s2 = 0
          while (s2 < bucketSize && !placed) {
            if (get16(bits, b * bucketSize + s2) == 0) {
              set16(bits, b * bucketSize + s2, cur); placed = true
            }
            s2 += 1
          }
          kick += 1
        }
        if (!placed) overflow = true
      }
      n += 1
    }
    overflow
  }

  /** Remove ONE slot copy per key (i1 slots first, then i2); callers
    * pass only keys present in the exact table. Mutates bits. */
  def deleteAll(bits: Array[Byte], hashes: Array[Long], nbuckets: Int,
                bucketSize: Int): Unit = {
    val bmask = (nbuckets - 1).toLong
    var n = 0
    while (n < hashes.length) {
      val h = hashes(n)
      val fp = fpOf(h)
      val b1 = ((h >>> 16) & bmask).toInt
      val b2 = b1 ^ ((fp * FPMIX) & bmask).toInt
      var hit = false
      var bi = 0
      while (bi < 2 && !hit) {
        val b = if (bi == 0) b1 else b2
        var s = 0
        while (s < bucketSize && !hit) {
          if (get16(bits, b * bucketSize + s) == fp) {
            set16(bits, b * bucketSize + s, 0); hit = true
          }
          s += 1
        }
        bi += 1
      }
      n += 1
    }
  }

  /** Register `name` = fold UDF (prevBits nullable, prevOverflow,
    * sorted hash array) -> struct(bits, overflow), and `name_del` =
    * delete UDF (bits, sorted hash array) -> bits. nbuckets /
    * bucketSize / maxKicks are fixed at registration — the engine
    * keeps them constant per warehouse (the Python fold reads them
    * from the row; constants make the two paths agree). */
  def register(spark: SparkSession, name: String, nbuckets: Int,
               bucketSize: Int, maxKicks: Int): Unit = {
    val foldFn = (prev: Array[Byte], prevOverflow: Boolean, hs: scala.collection.Seq[Long]) => {
      val bits =
        if (prev == null) new Array[Byte](2 * nbuckets * bucketSize)
        else prev.clone()
      val arr = if (hs == null) Array.empty[Long] else hs.toArray
      val ov = insertAll(bits, arr, nbuckets, bucketSize, maxKicks)
      (bits, prevOverflow || ov)
    }
    spark.udf.register(name, udf(foldFn))
    val delFn = (prev: Array[Byte], hs: scala.collection.Seq[Long]) => {
      val bits = prev.clone()
      deleteAll(bits, hs.toArray, nbuckets, bucketSize)
      bits
    }
    spark.udf.register(name + "_del", udf(delFn))
  }

  /** Broadcast-probe registration (BloomProbe pattern): collect the
    * sidecar once per cycle, broadcast, register `name(part, hash)`
    * -> maybe_seen. Re-registration destroys the previous broadcast. */
  def registerProbe(spark: SparkSession, cuckoo: DataFrame, name: String): Unit = {
    val rows = cuckoo.select("part", "nbuckets", "bucket_size", "overflow", "bits").collect()
    val tables: Map[Int, (Array[Byte], Int, Int, Boolean)] = rows.map { r =>
      r.getInt(0) -> ((r.getAs[Array[Byte]]("bits"), r.getLong(1).toInt,
        r.getInt(2), r.getBoolean(3)))
    }.toMap
    val bc = spark.sparkContext.broadcast(tables)
    synchronized {
      if (last != null) { last.destroy(); }
      last = bc
    }
    val fn = (part: Int, hash: Long) => {
      bc.value.get(part) match {
        case None => false
        case Some((bits, nbuckets, bucketSize, overflow)) =>
          if (overflow) true
          else {
            val bmask = (nbuckets - 1).toLong
            val fp = fpOf(hash)
            val b1 = ((hash >>> 16) & bmask).toInt
            val b2 = b1 ^ ((fp * FPMIX) & bmask).toInt
            var found = false
            var s = 0
            while (s < bucketSize && !found) {
              if (get16(bits, b1 * bucketSize + s) == fp) found = true
              s += 1
            }
            s = 0
            while (s < bucketSize && !found) {
              if (get16(bits, b2 * bucketSize + s) == fp) found = true
              s += 1
            }
            found
          }
      }
    }
    spark.udf.register(name, udf(fn))
  }

  /** Destroy the live table broadcast (end-of-crawl hygiene). */
  def release(): Unit = synchronized {
    if (last != null) { last.destroy(); last = null }
  }
}
