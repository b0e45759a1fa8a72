package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 source modeling the reference's paginated row-store scan
  * (SRC1, batch/dynamo_fetcher.py:281-364): a directory of JSONL
  * files, each file one scan "page" → one Spark input partition, so a
  * 1000-page store fans out to 1000 parallel readers instead of the
  * reference's serial LastEvaluatedKey loop.
  *
  * Faithful semantics:
  *   - schemaless items: every column surfaces as nullable string;
  *     nested values re-serialize as compact JSON (T3 coercion rules
  *     happen downstream in [[graft.ops.TextExtract]]);
  *   - case-insensitive field resolution (T1): keys are matched
  *     lower-cased, like the reference's lowered dict;
  *   - malformed/blank lines skipped (SRC3's skip-and-warn);
  *   - column pruning pushed into the reader (only requested fields
  *     are materialized);
  *   - filter pushdown deliberately limited to string equality and
  *     IsNotNull — the reference REMOVED its server-side numeric
  *     filter because the store couldn't compare numbers stored as
  *     strings (dynamo_fetcher.py:23-36); this source reproduces that
  *     caution in the capability interface: anything else stays a
  *     post-scan Spark filter.
  *   - OPT-IN numeric typing: `option("numericFields", "ts,value")`
  *     surfaces those fields as DoubleType (unparseable values →
  *     NULL), which is the Spark analog of the reference's stated
  *     scale remedy — "a Number-typed GSI + Query instead of Scan"
  *     (dynamo_fetcher.py:23-36). Once a field is number-typed,
  *     range predicates (the T4 temporal cutoff) push INTO the store
  *     reader and skip rows before they ever reach Spark.
  *
  * Usage: `spark.read.format("graft.sources.ItemStore")
  *   .option("path", dir).load()`.
  */
class ItemStore extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ItemStore.infer(options.get("path"),
      ItemStore.numericFields(options.get("numericFields")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ItemStoreTable(schema, properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

object ItemStore {
  private[sources] val mapper = new ObjectMapper()

  /** Union of keys over a bounded sample (up to 100 parseable lines
    * per page), lower-cased, first-seen order, all nullable strings —
    * schema-on-read for schemaless items. Rows are free to carry any
    * subset of the union (the reference discovers fields per row).
    */
  private[sources] def numericFields(opt: String): Set[String] =
    Option(opt).map(_.split(",").map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSet).getOrElse(Set.empty)

  def infer(path: String): StructType = infer(path, Set.empty)

  def infer(path: String, numeric: Set[String]): StructType = {
    val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
    pages(path).foreach { p =>
      val stream = Files.lines(p, StandardCharsets.UTF_8)
      try {
        val it = stream.iterator()
        var sampled = 0
        while (it.hasNext && sampled < 100) {
          val line = it.next().trim
          if (line.nonEmpty) {
            try {
              val node = mapper.readTree(line)
              if (node != null && node.isObject) {
                node.fieldNames().asScala.foreach { k =>
                  val lk = k.toLowerCase
                  if (!fields.contains(lk))
                    fields(lk) = StructField(lk,
                      if (numeric(lk)) DoubleType else StringType,
                      nullable = true)
                }
                sampled += 1
              }
            } catch { case _: Exception => () }
          }
        }
      } finally stream.close()
    }
    StructType(fields.values.toSeq)
  }

  def pages(path: String): Seq[java.nio.file.Path] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) Seq(dir)
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".jsonl") || p.toString.endsWith(".json"))
        .toSeq.sortBy(_.toString) // W2: sorted listing
      finally stream.close()
    }
  }

  private[sources] def render(node: JsonNode): String =
    if (node == null || node.isNull) null
    else if (node.isTextual) node.asText()
    else node.toString // numbers as-is, nested as compact JSON
}

class ItemStoreTable(schema: StructType, path: String)
  extends Table with SupportsRead {
  override def name(): String = s"itemstore($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ItemStoreScanBuilder(schema, path)
}

class ItemStoreScanBuilder(fullSchema: StructType, path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  /** LIMIT pushdown: each page reader stops after emitting `n`
    * post-filter rows instead of draining its page — on a paginated
    * store that is the difference between touching one page and
    * touching all of them. Partial by contract (the default
    * `isPartiallyPushed` = true): Spark still applies the global
    * limit over the per-partition prefixes, so correctness never
    * depends on the source.
    */
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept only what the store can answer reliably (see class doc):
    // string equality, null tests, and — on columns the USER declared
    // numeric (the "Number-typed GSI" opt-in) — range predicates.
    // Catalyst only emits numeric-valued Filters against DoubleType
    // columns, so a Number value here implies the field was declared.
    val (ok, rest) = filters.partition {
      case EqualTo(_, _: String) => true
      case IsNotNull(_) => true
      case EqualTo(_, _: Number) => true
      case GreaterThan(_, _: Number) => true
      case GreaterThanOrEqual(_, _: Number) => true
      case LessThan(_, _: Number) => true
      case LessThanOrEqual(_, _: Number) => true
      case _ => false
    }
    pushed = ok
    rest // everything else evaluated by Spark post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ItemStoreScan(required, pushed, path, limit)
}

class ItemStoreScan(schema: StructType, filters: Array[Filter], path: String,
                    limit: Int = -1)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"ItemStoreScan path=$path, " +
      s"ReadSchema: ${schema.simpleString}, " +
      s"PushedFilters: [${filters.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ItemStore.pages(path).map(p =>
      ItemStorePartition(p.toString): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ItemStoreReaderFactory(schema, filters, limit)
}

case class ItemStorePartition(file: String) extends InputPartition

class ItemStoreReaderFactory(schema: StructType, filters: Array[Filter],
                             limit: Int)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ItemStoreReader(schema, filters,
      p.asInstanceOf[ItemStorePartition].file, limit)
}

class ItemStoreReader(schema: StructType, filters: Array[Filter], file: String,
                      limit: Int = -1)
  extends PartitionReader[InternalRow] {
  private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
  private val it = lines.iterator()
  private var current: InternalRow = _
  private var emitted = 0
  private val numericCols: Set[String] =
    schema.fields.filter(_.dataType == DoubleType).map(_.name.toLowerCase).toSet

  /** Declared-numeric value: parsed double, NULL when unparseable —
    * a non-numeric item is simply absent from a Number-typed index.
    */
  private def toNum(s: String): java.lang.Double =
    if (s == null) null
    else try java.lang.Double.valueOf(s.trim) catch { case _: NumberFormatException => null }

  private def matches(get: String => String): Boolean = filters.forall {
    case EqualTo(a, v: String) => get(a.toLowerCase) == v
    case IsNotNull(a) =>
      val lk = a.toLowerCase
      if (numericCols(lk)) toNum(get(lk)) != null else get(lk) != null
    case EqualTo(a, v: Number) =>
      val n = toNum(get(a.toLowerCase)); n != null && n == v.doubleValue()
    case GreaterThan(a, v: Number) =>
      val n = toNum(get(a.toLowerCase)); n != null && n > v.doubleValue()
    case GreaterThanOrEqual(a, v: Number) =>
      val n = toNum(get(a.toLowerCase)); n != null && n >= v.doubleValue()
    case LessThan(a, v: Number) =>
      val n = toNum(get(a.toLowerCase)); n != null && n < v.doubleValue()
    case LessThanOrEqual(a, v: Number) =>
      val n = toNum(get(a.toLowerCase)); n != null && n <= v.doubleValue()
    case _ => true
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false // pushed-limit stop
    while (it.hasNext) {
      val line = it.next().trim
      if (line.nonEmpty) {
        try {
          val node = ItemStore.mapper.readTree(line)
          if (node != null && node.isObject) {
            // T1: case-insensitive field map
            val lowered = node.properties().asScala
              .map(e => e.getKey.toLowerCase -> e.getValue).toMap
            val get = (k: String) => ItemStore.render(lowered.getOrElse(k, null))
            if (matches(get)) {
              current = InternalRow.fromSeq(schema.fields.map { f =>
                val v = get(f.name.toLowerCase)
                if (v == null) null
                else if (f.dataType == DoubleType) toNum(v)
                else UTF8String.fromString(v)
              }.toSeq)
              emitted += 1
              return true
            }
          }
        } catch { case _: Exception => () } // SRC3 skip-and-warn
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
