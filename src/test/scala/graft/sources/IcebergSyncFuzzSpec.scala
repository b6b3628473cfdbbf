package graft.sources

import java.nio.file.{Files => JFiles}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Model-based fuzz over the BIDIRECTIONAL Iceberg sync: random op
  * sequences — appends, equality/position deletes, mor updates/merges,
  * cow mutations, schema evolution top-level AND nested (r20:
  * add/rename/drop/widen inside a struct column) — interleaved with sync
  * ticks, with the invariant that the mirror equals its source EXACTLY
  * after every tick. This is the guard for the r18 kind machinery and the
  * r19/r20 field-id resolution: any mis-classified kind, broken fold
  * boundary, schema-mismatch wedge, or replay double-apply shows up as a
  * row diff within a few steps. */
class IcebergSyncFuzzSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ==
      b.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  /** Fresh rows under the source's CURRENT schema (evolution-proof): `id`
    * unique ascending, strings derived from it, numerics `id % 7`, struct
    * columns built recursively — so appends stay legal across random
    * top-level and nested evolution. */
  private def freshRows(s: SparkSession, schema: Seq[(String, DataType)],
      from: Long, n: Int): DataFrame = {
    def gen(dt: DataType): Column = dt match {
      case StringType => concat(lit("v"), col("id"))
      case st: StructType =>
        struct(st.fields.toSeq.map(f => gen(f.dataType).as(f.name)): _*)
      case other => (col("id") % 7).cast(other)
    }
    val base = s.range(from, from + n).toDF("id")
    schema.filter(_._1 != "id").foldLeft(base) { case (d, (name, dt)) =>
      d.withColumn(name, gen(dt))
    }
  }

  test("fuzz store → chain: random append/eqdel/posdel/morupd/cow/evolve/" +
      "nested-evolve sequences sync with chain ≡ store after EVERY tick") {
    import spark.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(100 + trial)
      val root = JFiles.createTempDirectory(s"icesfz_s$trial").toFile.getAbsolutePath
      val dest = JFiles.createTempDirectory(s"icesfz_t$trial").toFile.getAbsolutePath
      val st = new SnapshotTable(spark, root)
      var nextId = 0L
      def schemaNow: Seq[(String, DataType)] =
        st.read().schema.fields.map(f => f.name -> f.dataType).toSeq
      def append(n: Int, op: String): Unit = {
        st.commit(freshRows(spark, schemaNow, nextId, n), op)
        nextId += n
      }
      // seed with a struct column so nested ops always have a holder
      st.commit(freshRows(spark, Seq("id" -> LongType, "v" -> StringType,
        "nest" -> StructType(Seq(StructField("p", StringType),
          StructField("q", IntegerType)))), 0, 30)); nextId = 30
      var added = 0
      var vName = "v" // the string column's CURRENT name (rename target)
      val addedCols = scala.collection.mutable.ArrayBuffer.empty[String]
      // the struct's current subfield names (never drop below one)
      val subs = scala.collection.mutable.ArrayBuffer("p", "q")
      var widened = false
      for (step <- 0 until 16) {
        rnd.nextInt(12) match {
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
          case 9 =>
            // NESTED ADD (r19): a fresh subfield appends at the end
            val c = s"n$step"; subs += c
            st.addNestedColumn("nest", c, "BIGINT")
          case 10 if subs.size > 1 =>
            // NESTED RENAME (r20): id carried, metadata-only both sides
            val i = rnd.nextInt(subs.size)
            val n2 = s"s$step"
            st.renameNestedColumn("nest", subs(i), n2); subs(i) = n2
          case 11 =>
            if (!widened && subs.contains("q")) {
              // NESTED WIDEN (r20): int → long under the same field id
              st.alterNestedColumnType("nest", "q", "BIGINT"); widened = true
            } else if (subs.size > 1) {
              // NESTED DROP (r20): bytes stay, id leaves
              val i = rnd.nextInt(subs.size)
              st.dropNestedColumn("nest", subs.remove(i))
            }
          case _ => append(3, "append")
        }
        if (step % 2 == 1 || step == 15) {
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

  test("fuzz chain → store: random foreign append/eqdel/posdel/evolution/" +
      "nested-evolution snapshots mirror with store ≡ chain after every " +
      "tick, and a lost record (crash replay) never changes content") {
    import spark.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(200 + trial)
      val chain = JFiles.createTempDirectory(s"icecfz_c$trial").toFile.getAbsolutePath
      val store = JFiles.createTempDirectory(s"icecfz_s$trial").toFile.getAbsolutePath
      var nextId = 0L
      var nest = StructType(Seq(StructField("p", StringType),
        StructField("q", IntegerType)))
      var colsBase: Seq[(String, DataType)] =
        Seq("id" -> LongType, "v" -> StringType, "nest" -> nest)
      def cols: Seq[(String, DataType)] = colsBase.map { case (n, t) =>
        n -> (if (n == "nest") nest else t) }
      var added = 0
      def export(n: Int, renames: Map[String, String] = Map.empty): Unit = {
        if (renames.isEmpty)
          IcebergExport.export(
            freshRows(spark, cols, nextId, n).coalesce(1), chain)
        else
          IcebergExport.exportInternal(
            freshRows(spark, cols, nextId, n).coalesce(1),
            chain, Nil, overwrite = false, Map.empty, renames = renames)
        nextId += n
      }
      export(20)
      val st = new SnapshotTable(spark, store)
      var widened = false
      for (step <- 0 until 12) {
        rnd.nextInt(9) match {
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
            colsBase = colsBase :+ (s"e$added" -> LongType)
            export(3)
          case 5 =>
            // foreign RENAME mid-chain (r19): the mirror must land it as
            // a store rename (field id carried), never a fold
            val cands = colsBase.filter(c => c._1 != "id" && c._1 != "nest")
            val (o, _) = cands(rnd.nextInt(cands.size))
            val n2 = s"r${step}_$added"
            colsBase = colsBase.map { case (c, t) =>
              (if (c == o) n2 else c, t) }
            export(3, renames = Map(o -> n2))
          case 6 =>
            // foreign NESTED ADD: subfields append at the end (Iceberg
            // nested evolution; the mirror lands a store nested-add)
            nest = StructType(nest.fields :+
              StructField(s"fn$step", LongType))
            export(3)
          case 7 if nest.fields.length > 1 =>
            // foreign NESTED RENAME via a dotted rename pair: subfield id
            // carried; the mirror lands a store nested rename, never fold
            val i = rnd.nextInt(nest.fields.length)
            val o = nest.fields(i).name
            val n2 = s"fr$step"
            nest = StructType(nest.fields.updated(i,
              nest.fields(i).copy(name = n2)))
            export(3, renames = Map(s"nest.$o" -> s"nest.$n2"))
          case 8 =>
            if (!widened && nest.fieldNames.contains("q")) {
              // foreign NESTED WIDEN int → long under the same field id
              nest = StructType(nest.fields.map(f =>
                if (f.name == "q") f.copy(dataType = LongType) else f))
              widened = true; export(3)
            } else if (nest.fields.length > 1) {
              // foreign NESTED DROP: the subfield leaves the schema
              val i = rnd.nextInt(nest.fields.length)
              nest = StructType(nest.fields.patch(i, Nil, 1))
              export(3)
            }
          case _ => export(3) // guarded case missed its guard: plain append
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
