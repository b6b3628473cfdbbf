package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based fuzzing of the snapshot store's op algebra (the
  * differential-testing strategy SURVEY §5 applies to queries via q70,
  * here applied to STATE): random sequences of commits, row-level DML
  * (cow + both merge-on-read delete-file kinds), rollback, compaction and
  * autonomous maintenance run against a plain in-memory model; after every
  * op the resolved table must equal the model EXACTLY (multiset), and time
  * travel to any surviving recorded version must reproduce the model's
  * history. A divergence anywhere in the chain fold order, delete-file
  * semantics, pointer commits, or maintenance rewrites fails loudly with
  * the op trace. */
class SnapshotFuzzSpec extends SparkSpec {

  private type Row3 = (Long, String, Double)

  test("random op sequences: resolved reads and time travel match the model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // trial 3 runs the same algebra over an identity-PARTITIONED store:
    // every commit lays out hive dirs, resolution reads through them, and
    // the hidden-column machinery must never leak or lose rows.
    // trial 4 runs it over a NON-file: FileSystem scheme ([[GraftTestFs]]):
    // the whole op algebra property-tests the Hadoop-FS metadata seam.
    for (trial <- 1 to 4) {
      val local = Files.createTempDirectory(s"snap_fuzz$trial").toFile.getAbsolutePath
      val root = if (trial == 4) {
        spark.sparkContext.hadoopConfiguration
          .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
        s"graftfs://$local"
      } else local
      val t = new SnapshotTable(spark, root)
      val partitioned = trial == 3
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]
      var model = Vector.empty[Row3]
      // model state as of each surviving version (time-travel oracle)
      val history = scala.collection.mutable.Map.empty[Long, Vector[Row3]]

      def rows(n: Int): Vector[Row3] = Vector.fill(n)(
        (rnd.nextInt(20).toLong, s"t${rnd.nextInt(5)}", rnd.nextInt(100) / 4.0))
      def df(rs: Vector[Row3]) = rs.toDF("id", "tag", "x")
      def record(v: Long): Unit = history(v) = model
      def check(op: String): Unit = {
        trace += op
        val got = t.read().as[Row3].collect().toVector.sorted
        assert(got == model.sorted,
          s"trial $trial diverged after: ${trace.mkString(" -> ")}\n" +
            s"got     ${got.take(30)}\nexpected ${model.sorted.take(30)}")
      }

      // keyless-changelog oracle: the expected multiset diff between two
      // model states — what changes(prevV, curV) must emit exactly
      def msDiff(before: Vector[Row3], after: Vector[Row3]): Vector[(Row3, String)] = {
        val cb = before.groupBy(identity).map { case (k, v) => k -> v.size }
        val ca = after.groupBy(identity).map { case (k, v) => k -> v.size }
        (cb.keySet ++ ca.keySet).toVector.flatMap { k =>
          val d = ca.getOrElse(k, 0) - cb.getOrElse(k, 0)
          if (d > 0) Vector.fill(d)((k, "insert"))
          else Vector.fill(-d)((k, "delete"))
        }
      }
      val expiredAll = scala.collection.mutable.Set.empty[Long]
      var cdcBase: Option[(Long, Vector[Row3])] = None
      def checkCdc(): Unit = {
        val curV = t.currentVersion.get
        cdcBase.filter { case (pv, _) => pv != curV && !expiredAll(pv) }
          .foreach { case (pv, pm) =>
            def asPairs(df: org.apache.spark.sql.DataFrame) =
              df.collect().map(r =>
                ((r.getAs[Long]("id"), r.getAs[String]("tag"),
                  r.getAs[Double]("x")), r.getAs[String]("_change_type")))
                .toVector.sorted
            val got = asPairs(t.changes(pv, curV))
            assert(got == msDiff(pm, model).sorted,
              s"trial $trial: keyless changes($pv, $curV) diverged after " +
                s"${trace.mkString(" -> ")}\ngot      ${got.take(30)}\n" +
                s"expected ${msDiff(pm, model).sorted.take(30)}")
            // the COMMIT-DERIVED changelog (O(delta) fast path for mor
            // commits, full-diff fallback otherwise) must emit the same
            // rows — property-tested against the model over the whole op
            // algebra, exactly like changes() above. Only applicable when
            // pv is curV's immediate log predecessor (each fuzz step
            // commits at most one version, so that is the usual case).
            val prevMain = t.commitOps().map(_._1).filter(_ < curV).lastOption
            if (prevMain.contains(pv)) {
              val fast = asPairs(t.changesForCommit(curV))
              assert(fast == msDiff(pm, model).sorted,
                s"trial $trial: changesForCommit($curV) diverged after " +
                  s"${trace.mkString(" -> ")}\ngot      ${fast.take(30)}\n" +
                  s"expected ${msDiff(pm, model).sorted.take(30)}")
            }
          }
        cdcBase = Some((curV, model))
      }

      val seed = rows(8)
      model = seed
      record(
        if (partitioned) t.commitPartitioned(df(seed).coalesce(1), Seq("tag"))
        else t.commit(df(seed).coalesce(1), op = "overwrite"))
      check("seed-overwrite")
      checkCdc()

      for (step <- 1 to 22) {
        rnd.nextInt(11) match {
          case 0 =>
            val rs = rows(1 + rnd.nextInt(6))
            model = model ++ rs
            record(t.commit(df(rs).coalesce(1), op = "append"))
            check(s"append(${rs.size})")
          case 1 =>
            val rs = rows(4 + rnd.nextInt(6))
            model = rs
            record(t.commit(df(rs).coalesce(1), op = "overwrite"))
            check(s"overwrite(${rs.size})")
          case 2 =>
            val cut = rnd.nextInt(20).toLong
            model = model.filterNot(_._1 < cut)
            record(t.deleteWhere(col("id") < cut))
            check(s"cow-delete(id<$cut)")
          case 3 =>
            val tag = s"t${rnd.nextInt(5)}"
            // equality delete keyed on id: every row SHARING a matching
            // row's id goes (the anti-join the mode documents)
            val ids = model.filter(_._2 == tag).map(_._1).toSet
            if (model.nonEmpty) {
              model = model.filterNot(r => ids(r._1))
              record(t.deleteWhereMor(col("tag") === tag, "id"))
              check(s"mor-delete(tag=$tag)")
            }
          case 4 =>
            val cut = rnd.nextInt(20).toLong
            if (model.nonEmpty) {
              // positional delete: exactly the matching rows, including
              // only SOME copies of duplicates — the model is a plain
              // multiset filter
              model = model.filterNot(_._1 == cut)
              record(t.deleteWherePos(col("id") === cut))
              check(s"pos-delete(id=$cut)")
            }
          case 5 =>
            val cut = rnd.nextInt(20).toLong
            if (model.nonEmpty) {
              model = model.map(r => if (r._1 >= cut) (r._1, r._2, r._3 + 1.0) else r)
              record(t.update(col("id") >= cut, Map("x" -> (col("x") + lit(1.0)))))
              check(s"cow-update(id>=$cut)")
            }
          case 6 =>
            record(t.compact(1 + rnd.nextInt(3)))
            check("compact")
          case 7 =>
            val vs = history.keys.toVector.sorted
            val target = vs(rnd.nextInt(vs.size))
            model = history(target)
            record(t.rollback(target))
            check(s"rollback($target)")
          case 8 =>
            TableMaintenance.maintain(spark, root).foreach(record)
            check("maintain")
          case 9 =>
            val expired = t.expireSnapshots(keep = 3).toSet
            expired.foreach(history.remove)
            expiredAll ++= expired
            check(s"expire(${expired.size})")
          case 10 =>
            if (model.nonEmpty) {
              // multiset VALUE delete (r18, the foreign pos-delete mirror
              // shape): exactly as many copies as picked go — the model is
              // a plain multiset subtraction
              val k = 1 + rnd.nextInt(math.min(4, model.size))
              val picked = rnd.shuffle(model).take(k)
              val counts = scala.collection.mutable.Map(
                picked.groupBy(identity).view.mapValues(_.size).toSeq: _*)
              model = model.filter { r =>
                counts.get(r) match {
                  case Some(n) if n > 0 => counts(r) = n - 1; false
                  case _ => true
                }
              }
              record(t.deleteRowsMultiset(df(picked)))
              check(s"multiset-delete($k)")
            }
        }
        // the keyless changelog between the previous head and the new one
        // must equal the model's multiset diff — CDC property-tested over
        // the WHOLE op algebra (appends, overwrites, all three delete
        // kinds, updates, rollback, compaction, maintenance)
        checkCdc()
        // time-travel spot check against a surviving recorded version
        val vs = history.keys.toVector.sorted
        if (vs.nonEmpty) {
          val v = vs(rnd.nextInt(vs.size))
          val tt = t.read(Some(v)).as[Row3].collect().toVector.sorted
          assert(tt == history(v).sorted,
            s"trial $trial: time travel to v=$v diverged after " +
              s"${trace.mkString(" -> ")}")
        }
      }
      // a FRESH instance replays the whole log to the same state
      assert(new SnapshotTable(spark, root).read().as[Row3]
        .collect().toVector.sorted == model.sorted,
        s"trial $trial: fresh-instance replay diverged")
    }
  }
}
