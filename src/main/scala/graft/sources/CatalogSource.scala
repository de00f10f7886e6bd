package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector replicating the reference's remote catalog
  * search (`utils/eumdacapi.py:30-67`): a deterministic product catalog —
  * one record per 15-minute acquisition slot — whose *source* understands
  * range predicates, LIMIT, and column pruning, exactly like the EUMETSAT
  * REST endpoint the reference pushes `dtstart/dtend`, `c=100` and its
  * sort into (SURVEY §3.2, §4 "custom DSv2 connector").
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.CatalogSource")
  *   .option("start", "1704067200")   // epoch seconds, inclusive
  *   .option("end",   "1706659200")   // epoch seconds, exclusive
  *   .load()                          // identifier STRING, ts TIMESTAMP
  * }}}
  *
  * Pushdown semantics: ts-range filters narrow which slots are ever
  * GENERATED (the remote-scan analog — unmatched slots never cross the
  * "network"), and a pushed LIMIT caps how many PAGES are planned. All
  * filters are also returned as residuals so Spark re-applies them —
  * pruning is an optimization, never a correctness dependence.
  *
  * Paging IS the partitioning: the reference fetches the catalog in
  * offset/count pages (`si=0, c=100`, sorted by start time —
  * `utils/eumdacapi.py:35-37`), so each input partition is one page of at
  * most `pageSize` products (default 100, the reference's `c`) — the unit
  * a real connector would turn into one HTTP request. A pushed LIMIT
  * composes with paging: only the first ⌈limit/pageSize⌉ pages are ever
  * planned, the remote analog of stopping at the page that satisfies the
  * client. Unlike the reference — which reads only the single first page
  * and silently truncates a >100-candidate window — the scan plans EVERY
  * page in range when no limit is pushed (asserted in PlanSpec with a
  * multi-page window).
  */
class CatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CatalogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CatalogTable(
      properties.getOrDefault("start", "1704067200").toLong,
      properties.getOrDefault("end", "1706659200").toLong,
      properties.getOrDefault("pageSize", "100").toInt)
}

object CatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("identifier", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))
  val slotSeconds = 900L
}

private[sources] class CatalogTable(startSec: Long, endSec: Long,
    pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"slot_catalog[$startSec,$endSec)"
  override def schema(): StructType = CatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new CatalogScanBuilder(startSec, endSec, pageSize)
}

private[sources] class CatalogScanBuilder(startSec: Long, endSec: Long,
    pageSize: Int) extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownRequiredColumns {

  private var lo = startSec
  private var hi = endSec
  private var limit = Long.MaxValue
  private var pushed = Array.empty[Filter]
  private var required = CatalogSource.schema

  private def toEpochSec(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(Math.floorDiv(t.getTime, 1000L))
    case i: java.time.Instant => Some(i.getEpochSecond)
    case _ => None
  }

  /** Narrow [lo, hi) from ts bounds; every filter stays residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case GreaterThan("ts", v) =>
        toEpochSec(v).exists { s => lo = math.max(lo, s + 1); true }
      case GreaterThanOrEqual("ts", v) =>
        toEpochSec(v).exists { s => lo = math.max(lo, s); true }
      case LessThan("ts", v) =>
        // s+1, not s: the bound may carry sub-second precision the
        // floored epoch loses (ts < 00:15:00.5 still admits the 00:15:00
        // slot). Over-generating one slot is safe — the residual filter
        // trims it; under-generating would lose rows.
        toEpochSec(v).exists { s => hi = math.min(hi, s + 1); true }
      case LessThanOrEqual("ts", v) =>
        toEpochSec(v).exists { s => hi = math.min(hi, s + 1); true }
      case EqualTo("ts", v) =>
        toEpochSec(v).exists { s =>
          lo = math.max(lo, s); hi = math.min(hi, s + 1); true }
      case IsNotNull("ts") | IsNotNull("identifier") => true
      case _ => false
    }
    pushed = accepted
    filters // all residual: Spark re-applies exact semantics
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  // a pushed limit still needs Spark's global limit (it caps per partition)
  override def isPartiallyPushed: Boolean = true

  /** ORDER BY ts [ASC] LIMIT n pushes as a TopN — the reference catalog
    * returns results sorted by start time (`sort=start,time,0`,
    * eumdacapi.py:37), and this source generates in exactly that order
    * with ts UNIQUE (one row per slot), so any ordering whose first key
    * is ts ASC is satisfied by generation order and later keys can never
    * break a tie that doesn't exist. Only ⌈n/pageSize⌉ pages get
    * planned; partial pushdown lets Spark merge the page prefixes. The
    * pipeline's earliest-candidate probe (ORDER BY ts LIMIT 1) thus
    * touches exactly one page. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    val sat = orders.nonEmpty &&
      orders.head.direction() ==
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING &&
      orders.head.expression().describe() == "ts"
    if (sat) limit = math.min(limit, n)
    sat
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new CatalogScan(lo, hi, limit, pageSize, required, pushed.length)
}

private[sources] class CatalogScan(lo: Long, hi: Long, limit: Long,
    pageSize: Int, required: StructType, nPushed: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** First slot ≥ lo (slots sit on the 900 s grid). */
  private val firstSlot = Math.floorDiv(lo + CatalogSource.slotSeconds - 1,
    CatalogSource.slotSeconds) * CatalogSource.slotSeconds
  /** Slots in [firstSlot, hi); 0 when the range is empty. */
  private val totalSlots: Long =
    if (firstSlot >= hi) 0L
    else Math.floorDiv(hi - firstSlot + CatalogSource.slotSeconds - 1,
      CatalogSource.slotSeconds)
  /** A pushed limit stops paging at the page that satisfies it: slots are
    * generated in ts order, so the first ⌈limit/pageSize⌉ pages carry a
    * valid LIMIT prefix (Spark re-applies the global limit on top —
    * isPartiallyPushed). */
  private val cappedSlots: Long = math.min(totalSlots, limit)
  private val nPages: Int =
    Math.toIntExact(Math.floorDiv(cappedSlots + pageSize - 1, pageSize))

  override def description(): String =
    s"graft-slot-catalog range=[$lo,$hi) pushedFilters=$nPushed limit=" +
      (if (limit == Long.MaxValue) "none" else limit.toString) +
      s" pageSize=$pageSize pages=$nPages"

  /** One input partition per remote PAGE (`si = page·pageSize, c =
    * pageSize` — eumdacapi.py:35-36): the unit a live connector maps to
    * one HTTP request, and the unit of scan parallelism here. */
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(nPages) { page =>
      val si = page.toLong * pageSize
      CatalogPartition(
        firstSlot + si * CatalogSource.slotSeconds,
        math.min(pageSize.toLong, cappedSlots - si)): InputPartition
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new CatalogReaderFactory(required)
}

/** One catalog page: `count` slots starting at `fromSec`. */
private[sources] case class CatalogPartition(fromSec: Long, count: Long)
    extends InputPartition

private[sources] class CatalogReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CatalogPartition]
    new PartitionReader[InternalRow] {
      private var slot = cp.fromSec
      private var emitted = 0L
      private var current: InternalRow = _
      override def next(): Boolean =
        if (emitted >= cp.count) false
        else {
          val values = required.fields.map(_.name match {
            case "identifier" => UTF8String.fromString(s"MSG4-$slot")
            case "ts" => java.lang.Long.valueOf(slot * 1000000L) // micros
          })
          current = InternalRow.fromSeq(values.toIndexedSeq)
          slot += CatalogSource.slotSeconds
          emitted += 1
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
