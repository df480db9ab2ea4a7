package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 Batch source generating the vote fact DISTRIBUTED —
  * the scale form of [[VotingGen]] (which, faithful to the reference's
  * generator loop, draws one sequential RNG stream on the driver and
  * therefore cannot parallelise). Here each input partition generates
  * its slice from an independent (seed, sliceId)-derived RNG: no
  * driver materialisation, rerun-stable, linear speedup with slices.
  * Candidate identities derive from `seed` alone so every slice votes
  * over the same candidate set; the reference's 22/40/38 cumulative-
  * walk weighting (quirk §2.5-5) is preserved via
  * [[VotingGen.weightedIndex]].
  *
  * Column pruning is pushed into the source
  * (`SupportsPushDownRequiredColumns`): a `select(candidate_id)` scan
  * never materialises the other columns' strings.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.VoteSource")
  *   .option("nVoters", 10000).option("seed", 42).option("slices", 32)
  *   .load()
  * }}}
  */
class VoteSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VoteSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // properties keys keep the caller's casing — normalise before lookup
    val p = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    new VoteSource.VoteTable(
      p.getOrElse("nvoters", "2000").toInt,
      p.getOrElse("seed", "42").toLong,
      p.getOrElse("slices", "8").toInt)
  }
}

object VoteSource {
  val schema: StructType = StructType(Seq(
    StructField("vote_id", StringType, nullable = false),
    StructField("voter_id", StringType, nullable = false),
    StructField("candidate_id", StringType, nullable = false),
    StructField("voted_at", TimestampType, nullable = false),
    StructField("vote", IntegerType, nullable = false)))

  private val StartMicros =
    java.sql.Timestamp.valueOf("2024-05-01 08:00:00").getTime * 1000L
  private val VoteIntervalMicros = 7L * 1000000L

  private def uuid(rnd: Random): String =
    f"${rnd.nextLong()}%016x-${rnd.nextInt(0xffff)}%04x"

  /** The per-seed candidate set, identical in every slice. */
  private[sources] def candidateIds(seed: Long): IndexedSeq[String] = {
    val rnd = new Random(seed)
    (0 until 3).map(_ => uuid(rnd))
  }

  private class VoteTable(nVoters: Int, seed: Long, slices: Int)
      extends Table with SupportsRead {
    override def name(): String = s"graft_votes(n=$nVoters,seed=$seed)"
    override def schema(): StructType = VoteSource.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new VoteScanBuilder(nVoters, seed, slices)
  }

  private class VoteScanBuilder(nVoters: Int, seed: Long, slices: Int)
      extends ScanBuilder with SupportsPushDownRequiredColumns {
    private var required: StructType = VoteSource.schema
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new VoteScan(nVoters, seed, slices, required)
  }

  private class VoteScan(nVoters: Int, seed: Long, slices: Int,
      required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val per = (nVoters + slices - 1) / slices
      (0 until slices).flatMap { s =>
        val start = s * per
        val n = math.min(per, nVoters - start)
        if (n > 0) Some(VotePartition(s, start, n): InputPartition) else None
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new VoteReaderFactory(seed, required.fieldNames)
  }

  private case class VotePartition(sliceId: Int, startRow: Int, numRows: Int)
    extends InputPartition

  private class VoteReaderFactory(seed: Long, fields: Array[String])
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val vp = p.asInstanceOf[VotePartition]
      new VoteReader(seed, fields, vp)
    }
  }

  private class VoteReader(seed: Long, fields: Array[String], p: VotePartition)
      extends PartitionReader[InternalRow] {
    // independent slice stream: golden-ratio mix so adjacent slice ids
    // do not yield correlated seeds
    private val rnd = new Random(seed ^ (p.sliceId.toLong * 0x9E3779B97F4A7C15L))
    private val cands = candidateIds(seed)
    private var i = -1
    private var row: InternalRow = _

    override def next(): Boolean = {
      i += 1
      if (i >= p.numRows) return false
      val globalRow = p.startRow + i
      // draw in a fixed order so pruning never changes the stream
      val voteId = uuid(rnd)
      val voterId = uuid(rnd)
      val cand = cands(VotingGen.weightedIndex(rnd.nextDouble()))
      val votedAt = StartMicros + globalRow.toLong * VoteIntervalMicros
      row = new GenericInternalRow(fields.map {
        case "vote_id" => UTF8String.fromString(voteId)
        case "voter_id" => UTF8String.fromString(voterId)
        case "candidate_id" => UTF8String.fromString(cand)
        case "voted_at" => votedAt
        case "vote" => 1
      }.asInstanceOf[Array[Any]])
      true
    }

    override def get(): InternalRow = row
    override def close(): Unit = ()
  }
}
