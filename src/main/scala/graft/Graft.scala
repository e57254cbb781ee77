package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** The library facade — the API a user of the reference engine programs
  * against after switching to this one. Each method is a thin, stable
  * name over the operator implementations in `graft.operators` /
  * `graft.streaming`; everything returns a plain DataFrame so results
  * compose with any further Spark code.
  *
  * {{{
  * val g = Graft(spark, "/data/sf100")
  * g.recommendations()            // per-user top-N item recs (item-kNN)
  * g.recommendationsAls()         // same, MLlib ALS factorization
  * g.itemSimilarity()             // item–item cosine pairs
  * g.dedupExact()                 // content dedup with stable survivor
  * g.nearDuplicates()             // n-gram Jaccard candidates
  * g.similarVectors()             // top-k ANN over the embeddings table
  * g.textQuality()                // per-doc quality features
  * }}}
  *
  * For the full operator surface (one named query per operator, nearly
  * all with a DuckDB parity oracle — [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] are the authoritative inventory) see
  * [[SparkEntry]]; for the scale design see SCALE.md.
  */
final case class Graft(spark: SparkSession, dataDir: String) {

  // — the recommender (the reference's core capability) —
  def ratings(): DataFrame = CfOps.ratingsDerive(spark, dataDir)
  def userMeans(): DataFrame = CfOps.userMeans(spark, dataDir)
  def itemSimilarity(): DataFrame = CfOps.itemCosine(spark, dataDir)
  def itemSimilarityPearson(): DataFrame = CfOps.itemPearson(spark, dataDir)
  def itemSimilarityJaccard(): DataFrame = CfOps.itemJaccard(spark, dataDir)
  def itemNeighbors(): DataFrame = CfOps.itemTopkNeighbors(spark, dataDir)
  def userSimilarity(): DataFrame = CfOps.userCosine(spark, dataDir)
  def recommendations(): DataFrame = CfOps.predictKnn(spark, dataDir)
  def recommendationsAls(): DataFrame = CfOps.als(spark, dataDir)
  def recommendationsAlsImplicit(): DataFrame = CfOps.alsImplicit(spark, dataDir)
  def recommendationsSlopeOne(): DataFrame = CfOps.slopeOne(spark, dataDir)
  def recommenderRmse(): DataFrame = CfOps.evalRmse(spark, dataDir)

  // — LLM-data-pipeline surface —
  def dedupExact(): DataFrame = DedupOps.dedupExact(spark, dataDir)
  def dedupExactNormalized(): DataFrame = DedupOps.dedupExactNorm(spark, dataDir)
  def nearDuplicates(): DataFrame = DedupOps.dedupNear(spark, dataDir)
  def nearDuplicatesMinhash(): DataFrame = DedupOps.dedupMinhashLsh(spark, dataDir)
  def nearDuplicatesSimhash(): DataFrame = DedupOps.dedupSimhash(spark, dataDir)
  def nearDuplicatesSimhashPairs(): DataFrame = DedupOps.dedupSimhashPairs(spark, dataDir)
  def containedDocuments(): DataFrame = DedupOps.dedupContainment(spark, dataDir)
  def nearDuplicatesEmbedding(): DataFrame = DedupOps.dedupEmbed(spark, dataDir)
  def similarVectors(): DataFrame = SimOps.simsearchTopk(spark, dataDir)
  def similarVectorsIvf(): DataFrame = SimOps.simsearchIvf(spark, dataDir)
  def similarVectorsLsh(): DataFrame = SimOps.simsearchLsh(spark, dataDir)
  def embeddingStats(): DataFrame = SimOps.multimodalStats(spark, dataDir)
  def textStats(): DataFrame = TextOps.textStats(spark, dataDir)
  def textTfidf(): DataFrame = TextOps.textTfidf(spark, dataDir)
  def textLanguage(): DataFrame = TextOps.textLangid(spark, dataDir)
  def textQuality(): DataFrame = TextOps.textQuality(spark, dataDir)
  def textTokens(): DataFrame = TextOps.textTokens(spark, dataDir)
  def textFingerprints(): DataFrame = TextOps.textFingerprint(spark, dataDir)
  def textNgrams(): DataFrame = TextOps.textNgrams(spark, dataDir)
  def textRepetition(): DataFrame = TextOps.textRepetition(spark, dataDir)
  def textPiiScrub(): DataFrame = TextOps.textPiiScrub(spark, dataDir)

  // — corpus curation —
  def sampleUniform(): DataFrame = SampleOps.sampleHash(spark, dataDir)
  def sampleStratified(): DataFrame = SampleOps.sampleStratified(spark, dataDir)

  // — user-based CF (the transpose chain) —
  def recommendationsUserBased(): DataFrame = CfOps.predictUserKnn(spark, dataDir)

  // — dedup clustering (pairs → groups → deduplicated corpus) —
  def duplicateClusters(): DataFrame = DedupOps.dedupCluster(spark, dataDir)
  def duplicateClustersStar(): DataFrame = DedupOps.dedupClusterStar(spark, dataDir)
  def dedupedCorpus(): DataFrame = DedupOps.dedupSurvivors(spark, dataDir)

  // — changelog → snapshot —
  def currentSnapshot(): DataFrame = SnapshotOps.upsertLatest(spark, dataDir)
  def history(): DataFrame = SnapshotOps.scd2Versions(spark, dataDir)

  // — sessionization (batch) —
  def sessions(): DataFrame = WindowOps.winSession(spark, dataDir)

  // — multimodal planning —
  def mediaDecode(): DataFrame = MultimodalOps.multimodalDecode(spark, dataDir)
  def mediaResize(): DataFrame = MultimodalOps.multimodalResize(spark, dataDir)
  def mediaFrames(): DataFrame = MultimodalOps.multimodalFrames(spark, dataDir)

  // — statistics / model selection / monitoring —
  def ridgeCrossValidation(): DataFrame = MlOps.mlRidgeCv(spark, dataDir)
  def calibration(): DataFrame = MlOps.mlCalibration(spark, dataDir)
  def mutualInformation(): DataFrame = MlOps.mlMutualInfo(spark, dataDir)
  def changepoints(): DataFrame = TsOps.tsCusum(spark, dataDir)
  def survivalCurve(): DataFrame = SnapshotOps.eventsSurvival(spark, dataDir)
  def bootstrapCi(): DataFrame = SampleOps.sampleBootstrap(spark, dataDir)
  def benfordAudit(): DataFrame = DqOps.dqBenford(spark, dataDir)
  def annRecall(): DataFrame = SimOps.simsearchRecall(spark, dataDir)
  def spendOutliers(): DataFrame = TsOps.tsMadOutliers(spark, dataDir)
  def precisionRecall(): DataFrame = MlOps.mlPrCurve(spark, dataDir)
  def communityModularity(): DataFrame = GraphOps.graphModularity(spark, dataDir)

  // — lakehouse table maintenance —
  def mergeChanges(): DataFrame = SnapshotOps.upsertMerge(spark, dataDir)
  def zorderedBoxQuery(): DataFrame = ScanOps.scanZorder(spark, dataDir)

  // — pipeline reporting —
  def ingestionGaps(): DataFrame = DqOps.dqGaps(spark, dataDir)
  def growthAccounting(): DataFrame = SnapshotOps.eventsLifecycle(spark, dataDir)
  def cleaningFunnel(): DataFrame = DedupOps.pipelineFunnel(spark, dataDir)
  def chunkDedup(): DataFrame = TextOps.textChunkDedup(spark, dataDir)
  def nearestClick(): DataFrame = JoinOps.joinAsofNearest(spark, dataDir)

  // — dedup admission & survivorship policies —
  def dedupedCorpusKeepBest(): DataFrame = DedupOps.dedupKeepBest(spark, dataDir)
  def nearDuplicatesPrefixFiltered(): DataFrame = DedupOps.dedupPrefixFilter(spark, dataDir)
  def ingestAdmission(): DataFrame = DedupOps.dedupIncremental(spark, dataDir)
  def splitLeakage(): DataFrame = DedupOps.splitLeakage(spark, dataDir)
  def assetDedup(): DataFrame = MultimodalOps.multimodalDedup(spark, dataDir)

  // — training-set construction —
  def nextItemExamples(): DataFrame = CfOps.cfSeqExamples(spark, dataDir)
  def negativeSamples(): DataFrame = CfOps.cfNegativeSamples(spark, dataDir)
  def bpeMerges(): DataFrame = TextOps.textBpeMerges(spark, dataDir)
  def diversifiedList(): DataFrame = CfOps.cfMmrRerank(spark, dataDir)

  // — compressed ANN (product quantization) —
  def vectorCodes(): DataFrame = SimOps.embedPq(spark, dataDir)
  def similarVectorsPq(): DataFrame = SimOps.simsearchPq(spark, dataDir)
  def pqRecall(): DataFrame = SimOps.simsearchPqRecall(spark, dataDir)

  // — diagnostics & profiling —
  def joinKeySkew(): DataFrame = DqOps.dqSkewReport(spark, dataDir)
  def candidateKeys(): DataFrame = DqOps.dqKeyDiscovery(spark, dataDir)
  def conversionLatency(): DataFrame = SnapshotOps.eventsFunnelLatency(spark, dataDir)
  def behaviorPatterns(): DataFrame = SnapshotOps.eventsPattern(spark, dataDir)
  def audienceOverlap(): DataFrame = AggOps.aggBitmapIntersect(spark, dataDir)
  def degreeAssortativity(): DataFrame = GraphOps.graphAssortativity(spark, dataDir)
  def clusterSilhouette(): DataFrame = MlOps.mlSilhouette(spark, dataDir)
  def baggedStumps(): DataFrame = MlOps.mlBaggedStumps(spark, dataDir)

  // — time series & history maintenance —
  def interpolatedSeries(): DataFrame = WindowOps.tsInterp(spark, dataDir)
  def historyMerge(): DataFrame = SnapshotOps.scd2Merge(spark, dataDir)

  /** Run any named operator from the full surface. */
  def query(name: String): DataFrame = SparkEntry.queries(name)(spark, dataDir)
}
