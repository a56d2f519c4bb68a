package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based armor for the custom as-of physical operator
  * (graft.plans.AsofJoinExec): on ARBITRARY generated target/marker
  * relations — including empty sides, duplicate (key, time) markers,
  * keys present on only one side, and ties at equal times — the native
  * streaming merge must equal the declarative formulation (per target,
  * the marker with the greatest (time, tiebreak) ≤ target time),
  * computed here by a plain per-row reference scan over the collected
  * marker list. Partition-count invariance rides the same property:
  * each case runs under a 1-partition and a 5-partition shuffle.
  */
class AsofPropertySpec extends SparkSpec {

  private case class T(key: Long, t: Long, id: Long)
  private case class M(key: Long, t: Long, tie: Long, payload: Long)

  private def referenceAsof(ts: Seq[T], ms: Seq[M]): Set[(Long, Option[Long])] =
    ts.map { tr =>
      val best = ms.filter(m => m.key == tr.key && m.t <= tr.t)
        .sortBy(m => (m.t, m.tie)).lastOption
      (tr.id, best.map(_.payload))
    }.toSet

  test("native as-of equals the reference pick on arbitrary inputs") {
    val sess = spark
    import sess.implicits._
    val genT = Gen.listOf(for {
      k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 20L)
    } yield (k, t))
    val genM = Gen.listOf(for {
      k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 20L)
      p <- Gen.choose(0L, 1000L)
    } yield (k, t, p))
    val prop = Prop.forAll(genT, genM, Gen.oneOf(1, 5)) { (rawT, rawM, parts) =>
      val ts = rawT.zipWithIndex.map { case ((k, t), i) => T(k, t, i.toLong) }
      val ms = rawM.zipWithIndex.map { case ((k, t, p), i) =>
        M(k, t, i.toLong, p)
      }
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val tDf = ss.createDataFrame(ts).select(
        col("key"), col("t"), col("id"))
      val mDf = ss.createDataFrame(ms).select(
        col("key").as("m_key"), col("t").as("m_t"), col("tie"),
        col("payload"))
      val out = graft.plans.AsofJoin.join(tDf, mDf,
          "key", "t", "m_key", "m_t", "tie")
        .select(col("id"), col("payload")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      out == referenceAsof(ts, ms)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40),
      prop)
    assert(res.passed, res.status.toString)
  }
}
