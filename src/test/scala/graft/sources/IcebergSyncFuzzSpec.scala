package graft.sources

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based fuzz over the BIDIRECTIONAL Iceberg sync: random op
  * sequences — appends, equality/position deletes, mor updates/merges,
  * cow mutations, schema evolution — interleaved with sync ticks, with the
  * invariant that the mirror equals its source EXACTLY after every tick.
  * This is the guard for the r18 kind machinery: any mis-classified kind,
  * broken fold boundary, schema-mismatch wedge, or replay double-apply
  * shows up as a row diff within a few steps. */
class IcebergSyncFuzzSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ==
      b.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** Fresh rows under the store's CURRENT schema (evolution-proof): `id`
    * unique ascending, `v` a derived string, every added column a derived
    * long — so appends stay legal across random addColumn/dropColumn. */
  private def freshRows(s: SparkSession, schema: Seq[(String, String)],
      from: Long, n: Int): DataFrame = {
    val base = s.range(from, from + n).toDF("id")
    schema.filter(_._1 != "id").foldLeft(base) { case (d, (name, dt)) =>
      if (dt == "StringType") d.withColumn(name, concat(lit("v"), col("id")))
      else d.withColumn(name, (col("id") % 7).cast("long"))
    }
  }

  test("fuzz store → chain: random append/eqdel/posdel/morupd/cow/evolve " +
      "sequences sync with chain ≡ store after EVERY tick") {
    import spark.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(100 + trial)
      val root = JFiles.createTempDirectory(s"icesfz_s$trial").toFile.getAbsolutePath
      val dest = JFiles.createTempDirectory(s"icesfz_t$trial").toFile.getAbsolutePath
      val st = new SnapshotTable(spark, root)
      var nextId = 0L
      def schemaNow: Seq[(String, String)] =
        st.read().schema.fields.map(f => f.name -> f.dataType.toString).toSeq
      def append(n: Int, op: String): Unit = {
        st.commit(freshRows(spark, schemaNow, nextId, n), op)
        nextId += n
      }
      st.commit(freshRows(spark,
        Seq("id" -> "LongType", "v" -> "StringType"), 0, 30)); nextId = 30
      var added = 0
      var vName = "v" // the string column's CURRENT name (rename target)
      val addedCols = scala.collection.mutable.ArrayBuffer.empty[String]
      for (step <- 0 until 14) {
        rnd.nextInt(9) match {
          case 0 | 1 => append(5 + rnd.nextInt(10), "append")
          case 2 if st.read().count() > 4 =>
            st.deleteWhereMor(col("id") % 9 === (step % 9).toLong, "id")
          case 3 if st.read().count() > 4 =>
            st.deleteWherePos(col("id") % 11 === (step % 11).toLong)
          case 4 if st.read().count() > 4 =>
            st.updateMor(col("id") % 7 === (step % 7).toLong,
              Map(vName -> concat(lit(s"u$step:"), col(vName))), "id")
          case 5 if st.read().count() > 4 =>
            st.deleteWhere(col("id") % 13 === (step % 13).toLong) // cow fold
          case 6 =>
            added += 1; val c = s"c$added"; addedCols += c
            st.addColumn(c, "BIGINT")
          case 7 if addedCols.nonEmpty =>
            val c = addedCols.remove(0)
            st.dropColumn(c)
          case 8 =>
            // RENAME (r19): must mirror metadata-only, id carried
            val n2 = s"v$step"
            st.renameColumn(vName, n2); vName = n2
          case _ => append(3, "append")
        }
        if (step % 2 == 1 || step == 13) {
          IcebergExport.syncStore(spark, root, dest)
          assert(sameRows(IcebergExport.readTable(spark, dest), st.read()),
            s"trial $trial step $step: chain diverged from store " +
              s"(history=${st.history().select("operation").collect()
                .map(_.getString(0)).mkString(",")})")
        }
      }
      // trailing ticks are no-ops and stay equal
      assert(IcebergExport.syncStore(spark, root, dest).isEmpty)
      assert(sameRows(IcebergExport.readTable(spark, dest), st.read()))
    }
  }

  test("fuzz chain → store: random foreign append/eqdel/posdel/evolution " +
      "snapshots mirror with store ≡ chain after every tick, and a lost " +
      "record (crash replay) never changes content") {
    import spark.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(200 + trial)
      val chain = JFiles.createTempDirectory(s"icecfz_c$trial").toFile.getAbsolutePath
      val store = JFiles.createTempDirectory(s"icecfz_s$trial").toFile.getAbsolutePath
      var nextId = 0L
      var cols = Seq("id" -> "LongType", "v" -> "StringType")
      var added = 0
      def export(n: Int): Unit = {
        IcebergExport.export(
          freshRows(spark, cols, nextId, n).coalesce(1), chain)
        nextId += n
      }
      export(20)
      val st = new SnapshotTable(spark, store)
      for (step <- 0 until 10) {
        rnd.nextInt(6) match {
          case 0 | 1 => export(4 + rnd.nextInt(8))
          case 2 =>
            // equality-delete a few ids (some may already be gone — fine)
            IcebergExport.appendEqualityDeletes(spark, chain,
              Seq(step.toLong, (step * 3).toLong, nextId - 1).toDF("id"),
              Seq("id"))
          case 3 =>
            // position-delete pos 0 of a random planned file (restating an
            // already-deleted position is legal and must no-op)
            val files = IcebergExport.plannedFiles(spark, chain)
              .filter(_._2 > 0)
            if (files.nonEmpty) {
              val f = files(rnd.nextInt(files.size))._1
              IcebergExport.appendPositionDeletes(spark, chain,
                Seq((f, 0L)).toDF("file_path", "pos"))
            }
          case 4 =>
            // schema evolution: ADD a fresh long column mid-chain
            added += 1
            cols = cols :+ (s"e$added" -> "LongType")
            export(3)
          case 5 =>
            // foreign RENAME mid-chain (r19): the mirror must land it as
            // a store rename (field id carried), never a fold
            val cands = cols.filter(_._1 != "id")
            val (o, _) = cands(rnd.nextInt(cands.size))
            val n2 = s"r${step}_$added"
            cols = cols.map { case (c, t) => (if (c == o) n2 else c, t) }
            IcebergExport.exportInternal(
              freshRows(spark, cols, nextId, 3).coalesce(1),
              chain, Nil, overwrite = false, Map.empty,
              renames = Map(o -> n2))
            nextId += 3
        }
        IcebergExport.syncFromTable(spark, chain, store)
        val back = IcebergExport.readTable(spark, chain)
        assert(sameRows(st.read(), back),
          s"trial $trial step $step: mirror diverged from chain " +
            s"(ops=${st.history().select("operation").collect()
              .map(_.getString(0)).mkString(",")})")
        // crash replay every few steps: drop the LAST record; a re-tick
        // must re-classify idempotently and change nothing
        if (step % 3 == 2) {
          val lastSid = IcebergExport.snapshotIds(spark, chain).last
          val rec = new java.io.File(s"$store/_graft_mirror/s-$lastSid.rec")
          if (rec.exists()) {
            assert(rec.delete())
            IcebergExport.syncFromTable(spark, chain, store)
            assert(sameRows(st.read(), back),
              s"trial $trial step $step: crash replay changed content")
          }
        }
      }
      assert(IcebergExport.syncFromTable(spark, chain, store).isEmpty)
    }
  }
}
