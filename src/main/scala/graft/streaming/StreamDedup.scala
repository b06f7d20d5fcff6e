package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Dedup
import graft.sources.TableStore

/** Streaming deduplication at ingest.
  *
  * Exact: the streaming face of [[graft.operators.Dedup.exactGroups]]
  * (same md5-fingerprint family). State is keyed by fingerprint and
  * evicted once the watermark passes `horizon` beyond a key's first
  * arrival (`dropDuplicatesWithinWatermark`), so memory is bounded by the
  * dedup horizon × ingest rate, not by corpus size. A duplicate arriving
  * after the horizon re-emits — the standard bounded-state tradeoff;
  * exact global dedup stays a batch job ([[graft.operators.Dedup]]).
  *
  * Near-dup: [[nearDupMaintainer]] keeps the MinHash-LSH band-key store
  * current from a document stream and emits each micro-batch's candidate
  * near-dup pairs against everything seen so far — online what
  * [[graft.operators.Dedup.incrementalCandidatePairs]] is per batch.
  */
object StreamDedup {

  /** Fingerprint the payload and keep the first arrival per fingerprint
    * within the watermark horizon. Works on a watermark-able stream;
    * `tsCol` is the event-time column the watermark advances on.
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      horizon: String): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Maintain the band-key store + candidate-pair log from a document
    * stream: each micro-batch shingles ONLY its own documents, joins its
    * band keys against the store (history is never re-shingled — the
    * [[graft.operators.Dedup.incrementalCandidatePairs]] contract), logs
    * the new candidate pairs, and APPENDS the batch's band keys as one
    * store partition (write volume O(batch), not O(state) — see
    * [[applyBatch]]). Union over all batches of the emitted pairs equals
    * the one-shot corpus pair set (StreamNearDupSpec asserts it) — so a
    * downstream clustering job always sees complete candidate edges no
    * matter how the corpus was batched.
    *
    * `checkpointDir` is REQUIRED (not optional) because the store's
    * replay guard keys on the stream's batch ids: without a durable
    * checkpoint, a restarted stream re-allocates batch ids from 0, every
    * new batch compares <= the store's high-water mark, and ingest
    * silently drops — the guard can only be as durable as the id
    * sequence it checks.
    */
  def nearDupMaintainer(stream: DataFrame, store: TableStore,
      checkpointDir: String,
      bandTable: String, pairsTable: String, idCol: String, textCol: String,
      numHashes: Int = 16, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, bandTable, pairsTable, idCol, textCol,
          numHashes, rowsPerBand, shingleN)(batch.toDF(), batchId)
      }

  /** Maintain the SUBSTRING-dedup span-count store + duplicated-span log
    * from a document stream — the streaming face of
    * [[graft.operators.Dedup.incrementalDuplicatedSpans]], sharing the
    * band store's layout discipline: each micro-batch windows ONLY its
    * own documents (history text is never re-windowed), joins its span
    * counts against the aggregated store, logs the spans duplicated
    * corpus-wide that involve this batch (`span_h, n_occ, n_new` —
    * including new-vs-new duplication), and appends the batch's counts
    * as ONE store partition. Write volume per batch is O(batch); the
    * store is a per-batch count log whose per-span SUM is the corpus
    * count (compact with [[graft.sources.TableStore.compact]] when the
    * partition count grows).
    *
    * Replay safety mirrors [[applyBatch]]: the span partition's presence
    * is the applied marker (lands last), the dup log's partition lands
    * first and replays by replacement, and folds recover parked
    * partitions before reading. `checkpointDir` is REQUIRED for the same
    * batch-id-durability reason as [[nearDupMaintainer]].
    */
  def substringMaintainer(stream: DataFrame, store: TableStore,
      checkpointDir: String,
      spanTable: String, dupTable: String, idCol: String, textCol: String,
      l: Int = 8): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applySubstringBatch(store, spanTable, dupTable, idCol, textCol, l)(
          batch.toDF(), batchId)
      }

  /** The per-batch substring fold, exposed for direct testing. */
  def applySubstringBatch(store: TableStore, spanTable: String,
      dupTable: String, idCol: String, textCol: String, l: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(spanTable)
    if (batchId > lastApplied) {
      // window once; the occurrences feed the dup join AND the count store
      val newOcc = Dedup.spanOccurrences(batch, idCol, textCol, l)
        .localCheckpoint()
      val oldCounts =
        if (!store.exists(spanTable))
          Dedup.spanCountStoreFromOcc(newOcc).limit(0)
        else
          store.read(spanTable).drop("__applied")
            .groupBy(col("span_h"))
            .agg(sum(col("n_old")).cast("long").as("n_old"))
      val dups = Dedup.incrementalDuplicatedSpans(oldCounts, newOcc)
        .withColumn("__batch", lit(batchId))
      store.replacePartitions(dupTable, dups, "__batch")
      store.replacePartitions(spanTable,
        Dedup.spanCountStoreFromOcc(newOcc).withColumn("__applied", lit(batchId)),
        "__applied")
    }
  }

  /** Maintain the EXACT prefix-Jaccard (PPJoin) stores from a document
    * stream — the deterministic-dedup counterpart of
    * [[nearDupMaintainer]]'s probabilistic LSH: each micro-batch emits
    * every Jaccard-≥-t pair it completes (new×history and new×new), with
    * EXACT similarity values, and the union over batches equals the
    * one-shot [[graft.operators.Dedup.prefixJaccardPairs]] answer.
    *
    * The incremental trick is the prefix ORDER: the one-shot operator
    * ranks shingles by corpus rarity, but document frequencies drift as
    * the corpus grows — a df-ordered store would re-rank every stored
    * document per batch. Prefixes here use the FIXED (xxhash64, shingle)
    * order ([[graft.operators.Dedup.prefixRankedStable]]), under which a
    * document's prefix is immutable on arrival; PPJoin's pruning is
    * exact under ANY total order (witness argument — see
    * [[graft.operators.Dedup.ppjoinCandidates]]).
    *
    * Per batch: shingle + prefix-rank ONLY the batch (history is never
    * re-shingled); candidates = batch-probe ⋈ (store ∪ batch)-index
    * UNION store-probe ⋈ batch-index (both directions, because the
    * probe must be the ≥-sized side and a new doc can be smaller than
    * its historical partner — each direction broadcasts the batch-sized
    * side); verify exactly against the shingle store semi-joined to
    * candidate docs. Writes are O(batch): the pair log lands FIRST
    * (replay replaces, never doubles), the shingle partition next, and
    * the prefix partition LAST as the applied marker — same replay
    * contract as [[applyBatch]]. `checkpointDir` REQUIRED for the same
    * batch-id-durability reason as [[nearDupMaintainer]].
    */
  def prefixMaintainer(stream: DataFrame, store: TableStore,
      checkpointDir: String,
      shTable: String, prefixTable: String, pairsTable: String,
      idCol: String, textCol: String, threshold: BigDecimal,
      shingleN: Int = 3): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyPrefixBatch(store, shTable, prefixTable, pairsTable,
          idCol, textCol, threshold, shingleN)(batch.toDF(), batchId)
      }

  /** The per-batch PPJoin fold, exposed for direct testing. */
  def applyPrefixBatch(store: TableStore, shTable: String,
      prefixTable: String, pairsTable: String, idCol: String,
      textCol: String, threshold: BigDecimal, shingleN: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(prefixTable)
    if (batchId > lastApplied) {
      // shingle + rank ONCE per batch; both feed joins and the stores
      val newSh = Dedup.shingleSet(batch, idCol, textCol, shingleN)
        .localCheckpoint()
      val newRanked = Dedup.prefixRankedStable(newSh, idCol, threshold)
        .localCheckpoint()
      val oldRanked =
        if (store.exists(prefixTable)) store.read(prefixTable).drop("__applied")
        else newRanked.limit(0)
      val oldSh =
        if (store.exists(shTable)) store.read(shTable).drop("__applied")
        else newSh.limit(0)
      // every pair involving a batch doc, exactly once: old×old pairs
      // were emitted by earlier folds and never regenerate (direction 2's
      // probe side is history-only, so each candidate there pairs an old
      // probe with a NEW index doc)
      val cands = Dedup.ppjoinCandidates(
          Dedup.ppjoinProbe(newRanked, idCol),
          Dedup.ppjoinIndex(oldRanked.unionByName(newRanked), idCol, threshold),
          threshold)
        .unionByName(Dedup.ppjoinCandidates(
          Dedup.ppjoinProbe(oldRanked, idCol),
          Dedup.ppjoinIndex(newRanked, idCol, threshold), threshold))
        .distinct()
      val pairs = Dedup.jaccardForPairsAtLeast(
          oldSh.unionByName(newSh), idCol, cands, threshold.toDouble)
        .withColumn("__batch", lit(batchId))
      store.replacePartitions(pairsTable, pairs, "__batch")
      store.replacePartitions(shTable,
        newSh.withColumn("__applied", lit(batchId)), "__applied")
      store.replacePartitions(prefixTable,
        newRanked.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** Maintain the EXACT edit-distance (PassJoin) stores from a document
    * stream — the streaming face of
    * [[graft.operators.Dedup.editDistancePairs]]: each micro-batch emits
    * every ED-≤-d pair it completes (new×history and new×new, with exact
    * distances), and the union over batches equals the one-shot answer.
    *
    * Unlike the PPJoin maintainer there is no ordering to freeze: the
    * PassJoin segment key (length, segment index, segment text) is
    * derived from the value alone, so a stored segment is immutable by
    * construction and history is never re-segmented. One candidate
    * direction also suffices — ED is symmetric, so the pigeonhole
    * witness exists in BOTH orientations (some segment of b appears
    * verbatim in a AND vice versa), and probe(batch) ⋈ segments(history
    * ∪ batch) covers every pair with a batch-side member. (PPJoin needs
    * both directions only because its prefixes are size-asymmetric.)
    *
    * Segments are stored at VALUE grain and only for values never seen
    * before, so exact-duplicate re-arrivals append nothing; doc pairs
    * re-expand from the verified value pairs against the doc store with
    * an at-least-one-new guard, which makes each doc pair land exactly
    * once — in the batch where its LATER member arrives. Doc ids are
    * assumed unique across batches (same contract as the near-dup and
    * PPJoin maintainers); a re-ingested id needs the batch rebuild.
    *
    * Writes are O(batch): pair log FIRST (replay replaces, never
    * doubles), the new-value segment partition next, and the doc
    * partition LAST as the applied marker. Hot-segment refinement is
    * intentionally absent at stream grain — per-batch bucket population
    * is (batch probes) × (stored segments in bucket), linear in the
    * store per batch; adversarial constant-prefix corpora should use the
    * one-shot rebuild (same exposure as the LSH band maintainer's hot
    * bands). `checkpointDir` REQUIRED for the same batch-id-durability
    * reason as [[nearDupMaintainer]].
    */
  def editMaintainer(stream: DataFrame, store: TableStore,
      checkpointDir: String,
      strTable: String, segTable: String, pairsTable: String,
      idCol: String, strCol: String, maxDist: Int): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyEditBatch(store, strTable, segTable, pairsTable,
          idCol, strCol, maxDist)(batch.toDF(), batchId)
      }

  /** The per-batch PassJoin fold, exposed for direct testing. */
  def applyEditBatch(store: TableStore, strTable: String, segTable: String,
      pairsTable: String, idCol: String, strCol: String, maxDist: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val d = maxDist
    require(d >= 1, s"maxDist must be >= 1, got $d")
    val lastApplied = store.lastAppliedBatch(strTable)
    if (batchId > lastApplied) {
      val newDocs = batch
        .select(col(idCol).as("__id"), col(strCol).as("__s"))
        .localCheckpoint()
      // the doc store is the marker table (written LAST), so it can
      // never hold partitions beyond lastApplied — no crash filter here
      val oldDocs =
        if (store.exists(strTable)) store.read(strTable).drop("__applied")
        else newDocs.limit(0)
      val batchBase = Dedup.editBase(newDocs.select(col("__s")))
        .localCheckpoint()
      val oldVals = oldDocs.select(col("__s")).distinct()
      val oldBase = oldVals.select(col("__s"), length(col("__s")).as("__len"))
      // segment only the truly-new values: the segment key is value-
      // derived and immutable, so history is never re-segmented and a
      // value re-arriving under a new doc id appends nothing
      val freshBase = batchBase.join(oldVals, Seq("__s"), "left_anti")
      val newSegs = Dedup.editSegs(freshBase, d).localCheckpoint()
      // a crashed attempt of THIS batch may have landed its segment
      // partition (segments commit before the marker): exclude it — the
      // refold recomputes and replaces that partition
      val oldSegs =
        if (store.exists(segTable))
          store.read(segTable)
            .filter(col("__applied") <= lastApplied).drop("__applied")
        else newSegs.limit(0)
      val allSegs = oldSegs.unionByName(newSegs)
      val longCand = Dedup.editProbes(batchBase, d).as("p")
        .join(allSegs.as("g"), col("p.kk") === col("g.kk"))
        .select(col("p.__s").as("ia"), col("g.__s").as("ib"))
      // short values (length ≤ d) have no segments; they bucket by
      // length against partners of length ≤ 2d — both directions,
      // because THIS join is role-asymmetric (the short side keys on
      // its own length)
      val allBase = oldBase.unionByName(freshBase)
      def shortCand(shortSide: DataFrame, partnerSide: DataFrame) =
        shortSide.filter(col("__len") <= d)
          .select(col("__s").as("ia"), col("__len").as("kb"))
          .join(partnerSide.filter(col("__len") <= 2 * d)
            .select(col("__s").as("ib"),
              explode(sequence(greatest(lit(0), col("__len") - d), lit(d)))
                .as("kb")), Seq("kb"))
          .select(col("ia"), col("ib"))
      val cands = longCand
        .unionByName(shortCand(batchBase, allBase))
        .unionByName(shortCand(allBase, batchBase))
        .filter(col("ia") =!= col("ib"))
        .select(least(col("ia"), col("ib")).as("va"),
          greatest(col("ia"), col("ib")).as("vb"))
        .distinct()
      // threshold'd verify — banded DP, early abort past d (same shape
      // as the one-shot's verify; kept values are exact)
      val vp = cands
        .withColumn("dist", levenshtein(col("va"), col("vb"), d))
        .filter(col("dist") >= 0)
      // doc expansion, exactly once per unordered pair: va ≠ vb makes
      // each (doc of va, doc of vb) combination appear in exactly one
      // vp row, and the at-least-one-new guard drops combinations
      // earlier batches already emitted
      val allDocs = oldDocs.withColumn("__new", lit(false))
        .unionByName(newDocs.withColumn("__new", lit(true)))
      val xa = allDocs.select(col("__id").as("ida"), col("__s").as("va"),
        col("__new").as("na"))
      val xb = allDocs.select(col("__id").as("idb"), col("__s").as("vb"),
        col("__new").as("nb"))
      val crossPairs = vp.join(xa, Seq("va")).join(xb, Seq("vb"))
        .filter(col("na") || col("nb"))
        .select(least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"), col("dist"))
      // identical-value doc pairs (dist 0): new×old once by fixing the
      // new side; new×new once via the id order guard
      val samePairs = newDocs.select(col("__id").as("ida"), col("__s"))
        .join(allDocs.select(col("__id").as("idb"), col("__s"),
          col("__new").as("nb")), Seq("__s"))
        .filter(col("ida") =!= col("idb"))
        .filter(!col("nb") || col("ida") < col("idb"))
        .select(least(col("ida"), col("idb")).as("id_a"),
          greatest(col("ida"), col("idb")).as("id_b"),
          lit(0).cast("int").as("dist"))
      val pairs = crossPairs.unionByName(samePairs)
        .withColumn("__batch", lit(batchId))
      store.replacePartitions(pairsTable, pairs, "__batch")
      store.replacePartitions(segTable,
        newSegs.withColumn("__applied", lit(batchId)), "__applied")
      store.replacePartitions(strTable,
        newDocs.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** Maintain the EXACT Hamming-≤d SimHash stores from a document
    * stream — the streaming face of
    * [[graft.operators.Dedup.simhashHammingPairs]]: each micro-batch
    * SimHashes ONLY its own documents (the token-hash aggregate is the
    * expensive stage; stored 32-bit signatures re-chunk for free,
    * map-side), joins its pigeonhole chunks against the signature
    * store's, and emits every Hamming-≤-d pair it completes with exact
    * distances — the union over batches equals the one-shot answer.
    *
    * One candidate direction suffices (simplest of the exact family):
    * the pigeonhole witness is a chunk BOTH sides carry verbatim, so
    * probe(batch) ⋈ chunks(history ∪ batch) covers every pair with a
    * batch-side member. Writes are O(batch): pair log FIRST (replay
    * replaces, never doubles), the one-row-per-doc signature partition
    * LAST as the applied marker. Doc ids unique across batches (same
    * contract as the other maintainers). Hot chunk buckets cost (batch
    * docs in bucket) × (stored docs in bucket) per batch — linear in
    * the store, the family's documented adversarial exposure.
    * `checkpointDir` REQUIRED for the same batch-id-durability reason
    * as [[nearDupMaintainer]].
    */
  def hammingMaintainer(stream: DataFrame, store: TableStore,
      checkpointDir: String, sigTable: String, pairsTable: String,
      idCol: String, textCol: String, maxDist: Int): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyHammingBatch(store, sigTable, pairsTable,
          idCol, textCol, maxDist)(batch.toDF(), batchId)
      }

  /** The per-batch SimHash fold, exposed for direct testing. */
  def applyHammingBatch(store: TableStore, sigTable: String,
      pairsTable: String, idCol: String, textCol: String, maxDist: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val d = maxDist
    val lastApplied = store.lastAppliedBatch(sigTable)
    if (batchId > lastApplied) {
      // only the batch is token-hashed; one row per doc
      val newSig = Dedup.simhashPortable(batch, idCol, textCol)
        .localCheckpoint()
      val oldSig =
        if (store.exists(sigTable)) store.read(sigTable).drop("__applied")
        else newSig.limit(0)
      val probe = Dedup.simhashChunks(newSig, idCol, d)
        .select(col("chunk"), col("chunk_val"),
          col("id").as("new_id"), col("h").as("h_new"))
      val index = Dedup.simhashChunks(oldSig.unionByName(newSig), idCol, d)
        .select(col("chunk"), col("chunk_val"),
          col("id").as("other_id"), col("h").as("h_other"))
      val pairs = probe.join(index, Seq("chunk", "chunk_val"))
        .filter(col("new_id") =!= col("other_id"))
        .select(
          least(col("new_id"), col("other_id")).as("doc_a"),
          greatest(col("new_id"), col("other_id")).as("doc_b"),
          bit_count(col("h_new").bitwiseXOR(col("h_other"))).as("hamming"))
        .filter(col("hamming") <= d)
        .distinct()
        .withColumn("__batch", lit(batchId))
      store.replacePartitions(pairsTable, pairs, "__batch")
      store.replacePartitions(sigTable,
        newSig.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** Maintain duplicate-CLUSTER labels from a document stream — the
    * streaming face of the `dedup_clusters_incremental` fold
    * ([[graft.operators.Dedup.mergeClusters]]): each micro-batch
    * shingles ONLY its own documents, generates its candidate pairs
    * against the band store, and folds them into the maintained
    * labeling. The old labeling is itself a star graph that preserves
    * old connectivity exactly, so the readout always equals one-shot
    * clustering of the full corpus — including the min-id cluster ids.
    *
    * Labels can't be partition-appended naively: a new edge can merge
    * two old components and RELABEL history. The store therefore holds
    * label DELTAS — per batch, only the docs newly labeled or relabeled
    * land (write volume O(Δ), bounded by the size of the components the
    * batch touched, not O(state)); a doc's current label is its
    * latest-batch delta row (`max_by(cluster, __batch)`), and docs in no
    * pair never appear, matching [[graft.operators.Dedup.dupClusters]].
    *
    * Write order: the label delta FIRST (a replayed batch replaces it),
    * the band partition LAST as the applied marker — same replay
    * contract as [[applyBatch]]; `checkpointDir` REQUIRED for the same
    * batch-id-durability reason as [[nearDupMaintainer]].
    */
  def clusterMaintainer(stream: DataFrame, store: TableStore,
      checkpointDir: String, bandTable: String, labelTable: String,
      idCol: String, textCol: String, numHashes: Int, rowsPerBand: Int,
      shingleN: Int): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyClusterBatch(store, bandTable, labelTable,
          idCol, textCol, numHashes, rowsPerBand, shingleN)(
          batch.toDF(), batchId)
      }

  /** The per-batch cluster fold, exposed for direct testing. */
  def applyClusterBatch(store: TableStore, bandTable: String,
      labelTable: String, idCol: String, textCol: String, numHashes: Int,
      rowsPerBand: Int, shingleN: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(bandTable)
    if (batchId > lastApplied) {
      val batchBands = Dedup.bandKeysFromWide(
        Dedup.minhashWide(
          batch.select(col(idCol),
            explode(graft.functions.TextAnalysis.shingles(col(textCol), shingleN))
              .as("shingle")),
          idCol, numHashes),
        idCol, numHashes, rowsPerBand)
      val oldBands =
        if (store.exists(bandTable)) store.read(bandTable).drop("__applied")
        else batchBands.limit(0)
      val newBands = batchBands
        .join(oldBands, Seq(idCol, "band", "band_key"), "left_anti")
        .localCheckpoint()
      // current labeling = latest delta per doc; a crashed attempt of
      // THIS batch may have landed its delta partition (deltas commit
      // before the marker) — exclude it, the refold replaces it
      val oldLabels =
        if (store.exists(labelTable))
          store.read(labelTable)
            .filter(col("__batch") <= lastApplied)
            .groupBy(col(idCol))
            .agg(max_by(col("cluster"), col("__batch")).as("cluster"))
            .withColumnRenamed(idCol, "doc_id")
        else batch.limit(0)
          .select(col(idCol).as("doc_id"), col(idCol).as("cluster"))
      val newPairs = Dedup.incrementalCandidatePairs(
        oldBands.unionByName(newBands), newBands, idCol)
      val merged = Dedup.mergeClusters(oldLabels, newPairs)
      // O(Δ) delta: only docs newly labeled or relabeled land — an
      // unchanged (doc, cluster) row is anti-joined away
      val delta = merged
        .join(oldLabels, Seq("doc_id", "cluster"), "left_anti")
        .withColumnRenamed("doc_id", idCol)
        .withColumn("__batch", lit(batchId))
      store.replacePartitions(labelTable, delta, "__batch")
      store.replacePartitions(bandTable,
        newBands.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** The per-batch fold, exposed for direct testing of replay semantics.
    *
    * Both stores are PARTITION-APPENDED, never rewritten: the band store
    * is partitioned by `__applied` (the batch id that contributed the
    * keys) and the pair log by `__batch`, and each fold lands exactly its
    * own batch's partition through [[TableStore.replacePartitions]] — so
    * the per-batch write volume is O(batch), not O(state), and a 100 TB
    * band store never gets copied to absorb a 1 GB micro-batch. Reads
    * first run [[TableStore.recoverPartitions]]: a crash inside a
    * previous fold's partition swap parks that partition in a side-dir,
    * and planning against a store missing parked history would silently
    * lose band keys (and with them every future cross-batch pair against
    * those docs).
    *
    * Replay safety (foreachBatch is at-least-once): the applied batch id
    * IS the band partition, which lands LAST, so a replayed batch
    * short-circuits on `batchId <= max(__applied)`; the pair log's
    * partition lands FIRST and is idempotent by reconstruction — a
    * crashed attempt of THIS batch id left at most a `__batch=<id>`
    * partition that the replay replaces, never doubles.
    *
    * Re-ingested documents: a doc id re-arriving in a later batch (same
    * or updated text) is folded by anti-joining its band keys against
    * the store — already-present (id, band, key) rows are dropped, so an
    * unchanged re-ingest appends nothing and re-emits no pairs, while an
    * UPDATED doc contributes only its changed band keys (its stale keys
    * stay in the store, so candidates are generated against both the old
    * and new fingerprints — conservative over-generation, the right
    * failure mode for a candidate stage; true key retraction needs the
    * batch rebuild).
    */
  def applyBatch(store: TableStore, bandTable: String, pairsTable: String,
      idCol: String, textCol: String, numHashes: Int, rowsPerBand: Int,
      shingleN: Int)(batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(bandTable)
    if (batchId > lastApplied) {
      val batchBands = Dedup.bandKeysFromWide(
        Dedup.minhashWide(
          batch.select(col(idCol),
            explode(graft.functions.TextAnalysis.shingles(col(textCol), shingleN))
              .as("shingle")),
          idCol, numHashes),
        idCol, numHashes, rowsPerBand)
      val oldBands =
        if (store.exists(bandTable)) store.read(bandTable).drop("__applied")
        else batchBands.limit(0)
      // shingle once; the deduped bands feed the join AND the store
      val newBands = batchBands
        .join(oldBands, Seq(idCol, "band", "band_key"), "left_anti")
        .localCheckpoint()
      val allBands = oldBands.unionByName(newBands)
      val newPairs = Dedup.incrementalCandidatePairs(allBands, newBands, idCol)
        .withColumn("__batch", lit(batchId))
      store.replacePartitions(pairsTable, newPairs, "__batch")
      store.replacePartitions(bandTable,
        newBands.withColumn("__applied", lit(batchId)), "__applied")
    }
  }
}
