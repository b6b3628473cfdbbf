package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact → MinHash/LSH → SimHash → n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - Exact dedup = one shuffle on a 128-bit content hash (not on the text
  *    itself — keys stay small).
  *  - MinHash: signatures are computed map-side with higher-order functions;
  *    only the banded buckets shuffle. Candidate pairs come from equi-joins
  *    on (band, bucket) — never an all-pairs cross join.
  *  - SimHash: 64-bit fingerprint map-side (UDF today; custom codegen
  *    Expression is the optimization path), near-dup candidates via
  *    band-of-16-bits equi-join, verified by hamming distance (`bit_count`).
  */
object Dedup {

  /** Exact dedup keeping a deterministic winner per content hash
    * (reference dedup pattern W1, clinicdata.sql:145-161, applied to text). */
  def exactDedup(df: DataFrame, text: Column, tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(md5(text)).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Duplicate-group report: one row per content hash appearing >1 time. */
  def exactDupGroups(df: DataFrame, text: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  // --- MinHash + LSH --------------------------------------------------------

  /** k-permutation MinHash signature over word-`shingleN` shingles.
    * Universal hashing h_i(x) = (a_i * xxhash64(x) + b_i) mod p with a fixed
    * seed; all arithmetic in native columns (one `transform`+`array_min` per
    * permutation, evaluated once per row, map-side).
    */
  def minhashSignature(text: Column, k: Int = 32, shingleN: Int = 3,
                       seed: Long = 42L): Column = {
    // 31-bit domain: a,b < 2^31 and h < 2^31 keep a*h+b < 2^62, so the
    // arithmetic never overflows a long even under ANSI mode.
    val p = 2147483647L // 2^31 - 1
    val rnd = new scala.util.Random(seed)
    val ab = Seq.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
    val hashes = transform(shingles(tokens(text), shingleN), s => pmod(xxhash64(s), lit(p)))
    array(ab.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** (id, band, bucket) LSH keys of an (__id, __sig) projection: each
    * signature slices into `bands` buckets (hash of the band's row slice).
    * Per-doc and map-side — the property the incremental path exploits: a
    * new doc's keys never depend on the rest of the corpus. */
  private def bandKeys(idx: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    idx.select(col("__id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(lit(b), concat_ws(",", slice(col("__sig"), b * r + 1, r)))
      }: _*)).as(Seq("band", "bucket")))
  }

  /** Banded-LSH candidate pairs: signature → `bands` buckets (hash of the
    * band's row slice), explode, equi-join on (band, bucket), dedupe pairs.
    * Output: (left id, right id) with left < right. The join key is
    * (band, bucket) so the shuffle is linear in corpus size; only same-bucket
    * rows ever meet.
    */
  def minhashCandidatePairs(df: DataFrame, id: Column, sig: Column,
                            k: Int = 32, bands: Int = 4): DataFrame = {
    val banded = bandKeys(df.select(id.as("__id"), sig.as("__sig")), k, bands)
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
      col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity between two shingle-set columns (verification
    * step after LSH candidate generation). */
  def jaccard(aShingles: Column, bShingles: Column): Column = {
    val inter = size(array_intersect(array_distinct(aShingles), array_distinct(bShingles)))
    val uni = size(array_union(aShingles, bShingles))
    when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(lit(0.0))
  }

  /** Near-duplicate pairs with verified n-gram Jaccard ≥ threshold:
    * LSH candidates → join back shingle sets → exact verify. At scale the
    * verify join is two broadcast-or-shuffle hash joins on the id key.
    */
  /** Per-doc dedup-index projection: (__id, __sh hashed-shingle set, __sig
    * MinHash signature). This IS the maintainable state of near-dup dedup —
    * every column is a pure function of one document, so a growing corpus
    * indexes only its delta ([[nearDupPairsDelta]]). One pass computes both
    * the verification shingle set (hashed to longs — set ops on 8-byte keys,
    * not full strings) and the signature; native kernels when available
    * (~µs/row), declarative HOF fallback otherwise. */
  def dedupIndex(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 32, shingleN: Int = 3): DataFrame = {
    import graft.functions.NativeTextExpressions
    val spark = df.sparkSession
    // The signature kernel is the most compute-dense map in the engine
    // (k × |shingles| universal hashes per row); an under-split input
    // serializes it on one core — fan out first (identity at real scan
    // widths; see ScaleOps.fanOutForKernels).
    val src = graft.ops.ScaleOps.fanOutForKernels(df)
    val nativeSh = NativeTextExpressions.shingleHashes(spark)(col(textCol), shingleN)
    val shCol = nativeSh
      .getOrElse(array_distinct(transform(shingles(tokens(col(textCol)), shingleN),
        s => xxhash64(s))))
    val sigCol = nativeSh match {
      case Some(sh) => NativeTextExpressions.minhashSig(spark)(sh, k, 42L)
        .getOrElse(minhashSignature(col(textCol), k, shingleN))
      case None => minhashSignature(col(textCol), k, shingleN)
    }
    src.select(col(idCol).as("__id"), shCol.as("__sh"), sigCol.as("__sig"))
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against an
    * index's shingle sets; keeps pairs at or above `threshold`. */
  private def verifyPairs(cands: DataFrame, idx: DataFrame,
                          threshold: Double,
                          broadcastCands: Boolean = false): DataFrame = {
    import graft.functions.NativeTextExpressions
    val spark = idx.sparkSession
    val sa = idx.select(col("__id").as("id_a"), col("__sh").as("sh_a"))
    val sb = idx.select(col("__id").as("id_b"), col("__sh").as("sh_b"))
    val jac = NativeTextExpressions.longSetJaccard(spark)(col("sh_a"), col("sh_b"))
      .getOrElse(jaccard(col("sh_a"), col("sh_b")))
    // Incremental callers set broadcastCands: the candidate PAIR LIST is
    // ids-only (16 bytes/row, distinct'd) and usually wave-sized, so
    // broadcasting it keeps the CORPUS-sized index un-shuffled for join1
    // (guide §8: move decisions, not payloads). join2's left side carries
    // the sh_a hashed-shingle ARRAYS, which a hot standing bucket can make
    // corpus-proportional (r21 review) — so it is NOT force-broadcast:
    // AQE's runtime size stats convert it to a broadcast join when it is
    // actually small (every wave at sane bucket sizes) and degrade to a
    // shuffle instead of an 8 GB broadcast failure when it is not. The
    // full-recompute path keeps the planner's choice throughout: its
    // candidate list is corpus-proportional by construction.
    val j1 =
      if (broadcastCands) broadcast(cands).join(sa, "id_a")
      else cands.join(sa, "id_a")
    val j2 = j1.join(sb, "id_b")
    j2.withColumn("jaccard", round(jac, 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 32, bands: Int = 4,
                   shingleN: Int = 3): DataFrame = {
    // Persisted: the index feeds the bucket join once + the verify join
    // twice; recomputing k×|shingles| hashes 3× would dominate runtime.
    // (Cache lifecycle: the cached projection lives until the session drops
    // it — batch harnesses should call spark.catalog.clearCache() between
    // corpora, as Verify/Bench do.)
    val base = dedupIndex(df, idCol, textCol, k, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nearDupPairsFromIndex(base, threshold, k, bands)
  }

  /** [[nearDupPairs]] over an already-built [[dedupIndex]] — callers that
    * maintain the index as standing state (the incremental path, q92) pay
    * candidate generation + verification only, never a re-shingle. */
  def nearDupPairsFromIndex(idx: DataFrame, threshold: Double, k: Int = 32,
                            bands: Int = 4): DataFrame = {
    val cands = minhashCandidatePairs(idx, col("__id"), col("__sig"), k, bands)
    verifyPairs(cands, idx, threshold)
  }

  /** Incremental near-dup maintenance, pair stage: the verified pairs that
    * involve AT LEAST ONE new document, given the existing corpus's index
    * and the delta's. Candidate generation is new-vs-all on the (band,
    * bucket) keys — cost O(|delta| + matched buckets), never a rescan of
    * old-vs-old (those pairs are already known). Because LSH keys and
    * Jaccard verification are per-doc/per-pair pure functions, the union of
    * old pairs and delta pairs is EXACTLY what a full recompute over
    * old ∪ delta yields — proven by DedupSpec and oracle-checked end-to-end
    * (q92). Reference anchor: autonomous incremental reflection refresh,
    * readme.md:381-389 — the same philosophy applied to the dedup index. */
  def nearDupPairsDelta(oldIndex: DataFrame, deltaIndex: DataFrame,
                        threshold: Double, k: Int = 32, bands: Int = 4): DataFrame = {
    // ONE equi-join of the delta's keys against the keys of old ∪ delta
    // replaces the previous [new-vs-old join + distinct] ∪ [new-vs-new
    // self-join + distinct] + union + distinct (three joins' worth of
    // exchanges collapsed to one join + one distinct — guide §2.4). The
    // produced pair SET is identical: joining newKeys against allKeys with
    // id inequality and least/greatest normalization yields every new-old
    // pair once and every new-new pair from both directions (deduped by the
    // same final distinct the previous formulation needed anyway).
    // The delta's keys BROADCAST: the wave is the bounded side by the
    // incremental contract (micro-batches / ingest waves), and broadcasting
    // it means the corpus-sized standing key stream is probed map-side —
    // never shuffled per wave.
    val newKeys = bandKeys(deltaIndex, k, bands)
    val allKeys = bandKeys(oldIndex.unionByName(deltaIndex), k, bands)
    val cands = broadcast(newKeys).alias("a").join(allKeys.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.__id") =!= col("b.__id"))
      .select(least(col("a.__id"), col("b.__id")).as("id_a"),
        greatest(col("a.__id"), col("b.__id")).as("id_b"))
      .distinct()
    verifyPairs(cands, oldIndex.unionByName(deltaIndex), threshold,
      broadcastCands = true)
  }

  /** Incremental near-dup maintenance, component stage: fold a delta edge
    * list into an existing (id, component) assignment without re-clustering
    * the whole corpus. The standing components are CONTRACTED to their
    * roots: each delta-edge endpoint maps to its component label (its own
    * id if previously unseen), so the graph that re-clusters has one node
    * per touched root/new doc and at most one edge per delta pair —
    * O(|delta|), never O(|affected members|). (The previous formulation
    * re-ran components over every MEMBER of every touched cluster; on a
    * 100 TB corpus one hot cluster would drag millions of already-settled
    * rows back through the loop.) After the small contracted
    * [[connectedComponents]] run, old assignments relabel through their
    * root with one equi-join and untouched roots pass through unchanged.
    *
    * Labels are identical to a full recompute over (old edges ∪ new
    * edges): every old root is the minimum of its members, so the min over
    * a merged cluster's roots and new members equals the min over its full
    * membership. */
  def mergeComponents(oldComponents: DataFrame, newEdges: DataFrame,
                      srcCol: String = "id_a", dstCol: String = "id_b",
                      checkpointDir: Option[String] = None): DataFrame = {
    val edges = newEdges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b"))
    val la = oldComponents.select(col("id").as("id_a"), col("component").as("__ra"))
    val lb = oldComponents.select(col("id").as("id_b"), col("component").as("__rb"))
    val contracted = edges
      .join(la, Seq("id_a"), "left").join(lb, Seq("id_b"), "left")
      .select(coalesce(col("__ra"), col("id_a")).as("id_a"),
        coalesce(col("__rb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")) // intra-component pair: no-op
    val rootMap = connectedComponents(contracted, "id_a", "id_b",
        checkpointDir = checkpointDir)
      .select(col("id").as("__root"), col("component").as("__newc"))
    val relabeled = oldComponents
      .join(rootMap.withColumnRenamed("__root", "component"), Seq("component"), "left")
      .select(col("id"), coalesce(col("__newc"), col("component")).as("component"))
    val newNodes = rootMap
      .join(oldComponents.select(col("id")), rootMap("__root") === col("id"), "left_anti")
      .select(col("__root").as("id"), col("__newc").as("component"))
    relabeled.unionByName(newNodes)
  }

  // --- Connected components -------------------------------------------------

  /** Connected components over a near-duplicate pair list — the clustering
    * step that turns pairwise matches into dedup GROUPS (keep one canonical
    * doc per cluster, drop the rest). Without it, transitive duplicates
    * (A~B, B~C but A̸~C) survive pairwise dedup.
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): converges in
    * O(log² n) rounds regardless of component shape — unlike plain min-label
    * propagation, whose round count is the component DIAMETER (a chain of
    * crawl near-dups would need one round per link). Scale properties:
    *  - each round is two aggregate+equi-join passes on the node key — no
    *    collect_list of neighborhoods, so a 10M-member component never
    *    materializes a row bigger than one (node, min) pair;
    *  - per-round lineage is truncated by a checkpoint so the plan stays
    *    O(1) per round instead of O(rounds). The default is
    *    `localCheckpoint` — blocks live on executor storage, the right
    *    trade on local[N] and for short jobs, but NOT fault-tolerant: on a
    *    real cluster, losing one executor mid-iteration loses blocks and
    *    kills the job unrecoverably. For cluster runs pass `checkpointDir`
    *    (a reliable store path — HDFS/S3): rounds then use reliable
    *    `.checkpoint()`, which survives executor loss at the cost of one
    *    distributed write per round;
    *  - convergence is detected by an order-independent edge-set checksum
    *    (count + sum of per-edge hashes), one tiny driver scalar per round.
    *    The checksum SCREENS: the two exceptAll set-compares that confirm
    *    the fixpoint exactly only run on rounds whose checksum already
    *    matches the predecessor's (&&-short-circuit), i.e. normally exactly
    *    once, on the final confirming round.
    *
    * Returns one row per node appearing in `pairs`: (id, component) where
    * component = the minimum id in the node's cluster (so the canonical
    * representative satisfies id == component). Ids must be orderable.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None,
                          smallGraphEdges: Int = -1): DataFrame = {
    val spark = pairs.sparkSession
    // SMALL-GRAPH FAST PATH (opt guide §1.2: fix the distributed algorithm
    // first). Each star round costs ~6 tiny shuffles + a checkpoint + a
    // checksum action — pure scheduling overhead when the edge list is small,
    // which it usually is: near-dup edges are a sliver of the corpus, and
    // mergeComponents CONTRACTS the standing assignment so its graph is
    // O(delta) by design. Below the bound (default 100k canon edges ≈ 1.6 MB
    // on the driver — far under any sane spark.driver.maxResultSize; tune
    // with graft.cc.smallGraphEdges, 0 disables) the canonical edge list is
    // collected ONCE via a bounded limit(n+1) probe — never an unbounded
    // collect — and resolved with union-find in O(E α(E)). Labels are
    // IDENTICAL to the star loop's (component = min member id; pinned by
    // DedupSpec's fast≡distributed fuzz). Past the bound the probe abandons
    // and the distributed loop below runs unchanged — 100 TB corpora with
    // billions of edges never touch the driver.
    val bound =
      if (smallGraphEdges >= 0) smallGraphEdges
      else spark.conf.get("graft.cc.smallGraphEdges", "100000").toInt
    val proj0 = pairs.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val idTypes = proj0.schema.fields.map(_.dataType).toSeq
    val integral = idTypes.forall(dt =>
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType)
    val probing = bound > 0 && integral
    // When probing, PERSIST the projected pair list: the probe must evaluate
    // the (often expensive — LSH candidates + Jaccard verify) upstream
    // pipeline, and an over-bound graph would otherwise re-run that whole
    // pipeline from scratch for the distributed loop's first round (review
    // finding r20). The loop's first truncate() materializes from the cache,
    // after which the finally-block releases it.
    val proj =
      if (probing) proj0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else proj0
    try {
    if (probing) {
      // canon-equivalent bounded probe: distinct undirected non-self edges
      val canonEdges = proj
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).cast("long").as("u"),
          least(col("u"), col("v")).cast("long").as("v"))
        .distinct()
      val head = canonEdges.limit(bound + 1).collect()
      if (head.length <= bound) {
        // union-find, min id as root: parent(larger root) = smaller root
        val parent = new java.util.HashMap[Long, Long](head.length * 4)
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (c != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
          r
        }
        head.foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        val outLong = idTypes.contains(org.apache.spark.sql.types.LongType)
        val outDt: org.apache.spark.sql.types.DataType =
          if (outLong) org.apache.spark.sql.types.LongType
          else org.apache.spark.sql.types.IntegerType
        val nullable = proj.schema.fields.exists(_.nullable)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", outDt, nullable),
          org.apache.spark.sql.types.StructField("component", outDt, nullable)))
        def boxed(x: Long): Any = if (outLong) x else x.toInt
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size)
        val it = parent.keySet().iterator()
        while (it.hasNext) {
          val n = it.next()
          rows.add(org.apache.spark.sql.Row(boxed(n), boxed(find(n))))
        }
        return spark.createDataFrame(rows, schema)
      }
      // over the bound: fall through to the distributed star loop
    }
    val sc = pairs.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    // lineage truncation per round: reliable when a dir is given, else local
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    // canonical undirected form: (hi, lo), no self-loops, deduped
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()

    // large-star: every node v > u links to m(u) = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbrs.filter(col("v") > col("u")).join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star: every lo-neighbor of u (and u itself) links to the min
    // lo-neighbor — edges only point downward, so m = min(N≤(u))
    def smallStar(e: DataFrame): DataFrame = {
      val dir = canon(e)
      val mins = dir.groupBy("u").agg(min("v").as("m"))
      dir.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
    }

    def checksum(e: DataFrame): (Long, Long) = {
      // per-edge hashes reduced mod 1e9+7 before summing: the sum stays well
      // under Long.MaxValue for any realistic edge count (ANSI-safe). The
      // checksum only SCREENS for a fixpoint — equality is confirmed with an
      // exact set compare below, so a hash collision can never end the loop
      // on unequal edge sets.
      val r = e.agg(count(lit(1)),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    var edges = truncate(canon(proj))
    var prev = checksum(edges)
    var iter = 0
    var converged = prev._1 == 0L
    while (!converged && iter < maxIter) {
      val next = truncate(canon(smallStar(largeStar(edges))))
      val cur = checksum(next)
      converged = cur == prev &&
        next.exceptAll(edges).isEmpty && edges.exceptAll(next).isEmpty
      prev = cur
      edges = next
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter rounds")
    // fixpoint = star graphs: every edge is (node, componentMin); roots
    // (= the per-component minima) map to themselves
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")).distinct())
    } finally {
      // fast path: the returned frame is a local relation; distributed path:
      // round 0 is already checkpointed — either way the cache is done
      if (probing) proj.unpersist()
    }
  }

  // --- SimHash --------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens. UDF (scalar, deterministic,
    * map-side); upgrade path is a codegen'd Catalyst Expression with the same
    * contract. */
  val simhash64 = udf { text: String =>
    if (text == null) 0L
    else {
      val votes = new Array[Int](64)
      text.toLowerCase.trim.split("\\s+").foreach { t =>
        val h = graft.util.Hashing.fnv1a64(t)
        var i = 0
        while (i < 64) { votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      }
      var fp = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
      fp
    }
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * chunks (any-band equality catches all pairs within hamming distance 3),
    * equi-join on (band, chunk), verify with bit_count(xor) ≤ maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // per-token 64-lane voting is compute-dense: fan an under-split scan out
    val fp = graft.ops.ScaleOps.fanOutForKernels(df)
      .select(col(idCol).as("__id"), simhash64(col(textCol)).as("__fp"))
    val banded = fp.select(col("__id"), col("__fp"), posexplode(
      array((0 until 4).map(b => shiftright(col("__fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band", "chunk")))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        bit_count(col("a.__fp").bitwiseXOR(col("b.__fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
