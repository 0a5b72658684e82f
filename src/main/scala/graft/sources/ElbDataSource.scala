package graft.sources

import java.io.{BufferedReader, InputStreamReader, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringContains, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.elb.ElbSchema

/** DataSource V2 for ELB/ALB access logs: `spark.read.format("elb")
  * .load(glob)` scans `.gz` (or plain) log files and emits the 29
  * positional raw fields plus `log_source_file` — the same frame as
  * `ElbParser.readRaw → tokenize` (ElbSourceSpec pins byte equality,
  * edge lines included), but as a first-class source:
  *
  *  - **Column pruning reaches the reader**: `SupportsPushDownRequiredColumns`
  *    hands the pruned schema to each partition reader, which
  *    materializes ONLY the requested fields from each line (the
  *    tokenizer still scans the line once — it must find separators —
  *    but per-field string allocation and row width drop to the
  *    projection, and `ReadSchema` in the plan shows the truth).
  *  - **One partition per file**, the correct split for gzip members
  *    (reference behavior: whole-file streaming; the splittable path
  *    at scale is the q55 zstd landing zone, `elb/Ingest.scala`).
  *
  * The line tokenizer reproduces Spark's `from_csv` quoting semantics
  * for `sep=" " quote='"' escape='\'` EXACTLY — including the dark
  * corners, each pinned by probing the real parser: unquoted fields
  * treat quotes/escapes literally; empty unquoted fields are null,
  * quoted empties are `""`; an unclosed quote consumes the rest of the
  * line with escapes applied; garbage after a closing quote reverts
  * the field to RAW text (quotes kept) up to the next separator; a
  * trailing separator at end-of-line emits nothing.
  */
class ElbDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "elb"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ElbDataSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ElbTable(ElbDataSource.resolvePaths(properties))
}

object ElbDataSource {
  val fileColumn = "log_source_file"
  val fullSchema: StructType =
    StructType(ElbSchema.raw.fields :+ StructField(fileColumn, StringType, nullable = false))

  /** Paths from DSv2 options: `.load(p)` → "path"; `.load(ps: _*)` →
    * "paths" as a JSON string array (simple values — parsed with the
    * JSON string-literal rules, no nesting exists here).
    */
  private[sources] def resolvePaths(props: java.util.Map[String, String]): Seq[String] = {
    val multi = Option(props.get("paths")).toSeq.flatMap { js =>
      val s = js.trim.stripPrefix("[").stripSuffix("]")
      // JSON string literals, comma-separated; our paths contain no
      // escapes beyond what URI-safe file paths allow
      s.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val single = Option(props.get("path")).toSeq
    val all = multi ++ single
    require(all.nonEmpty, "elb source requires a path")
    all
  }

  /** Driver-side glob expansion, mirroring Spark's file-index rules
    * (skip hidden `_`/`.` files).
    */
  private[sources] def expand(paths: Seq[String], conf: Configuration): Seq[String] = {
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matches: Seq[FileStatus] =
        Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }.filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }.map { st =>
      // render like `input_file_name()` does (empty authority kept:
      // file:///x, not Path.toUri's file:/x) so the file column is
      // byte-identical to the text-source path
      val u = st.getPath.toUri
      new java.net.URI(u.getScheme, Option(u.getAuthority).getOrElse(""),
        u.getPath, null, null).toString
    }.sorted
  }
}

/** Minimal serializable Hadoop-conf carrier (the stock spark one is
  * `private[spark]`): Configuration itself knows how to write/read its
  * fields.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

class ElbTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"elb(${paths.mkString(",")})"
  override def schema(): StructType = ElbDataSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new ElbScanBuilder(paths, new SerializableHadoopConf(conf))
  }
}

class ElbScanBuilder(paths: Seq[String], conf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = ElbDataSource.fullSchema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept the string-comparison shapes the reader can evaluate on the
    * token array BEFORE materializing a row (null-safe: a null token
    * fails every accepted predicate, exactly like the SQL semantics).
    * Everything accepted is ALSO returned as a post-scan filter —
    * standard V2 contract for sources that cannot guarantee exhaustive
    * application (Spark re-checks; the win is rows dropped pre-alloc).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo(a, _: String) => ElbSchema.rawColumns.contains(a)
      case In(a, vs) if vs.forall(_.isInstanceOf[String]) =>
        ElbSchema.rawColumns.contains(a)
      case IsNotNull(a) => ElbSchema.rawColumns.contains(a)
      case StringStartsWith(a, _) => ElbSchema.rawColumns.contains(a)
      case StringContains(a, _) => ElbSchema.rawColumns.contains(a)
      case _ => false
    }
    pushed = ok
    rest ++ ok
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new ElbScan(paths, required, pushed, conf)
}

case class ElbFilePartition(path: String) extends InputPartition

class ElbScan(paths: Seq[String], required: StructType, pushed: Array[Filter],
    conf: SerializableHadoopConf) extends Scan with Batch {
  private lazy val files = ElbDataSource.expand(paths, conf.value)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"elb scan: ${files.size} files, ${required.fieldNames.mkString(",")}" +
      (if (pushed.isEmpty) "" else s", PushedFilters: ${pushed.mkString(", ")}")
  override def planInputPartitions(): Array[InputPartition] =
    files.map(ElbFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ElbReaderFactory(required.fieldNames, pushed, conf)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ElbMicroBatchStream(paths, required, pushed, conf)
}

/** File-count offsets over the SORTED listing: batch N..M reads files
  * N until M of the lexicographic order. Exactly-once holds for
  * append-only directories whose new files sort after processed ones —
  * true for ALB's timestamped log object names, and the reason this
  * stays a dozen lines where the general text file source carries a
  * seen-files map. (A violated assumption shows up loudly: the drain
  * re-reads or skips whole files, which ElbSourceSpec's incremental
  * test would catch.)
  */
case class ElbFileOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

class ElbMicroBatchStream(paths: Seq[String], required: StructType,
    pushed: Array[Filter], conf: SerializableHadoopConf) extends MicroBatchStream {
  private def listing(): Seq[String] = ElbDataSource.expand(paths, conf.value)
  override def initialOffset(): Offset = ElbFileOffset(0)
  override def latestOffset(): Offset = ElbFileOffset(listing().size)
  override def deserializeOffset(json: String): Offset =
    ElbFileOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ElbFileOffset].n
    val e = end.asInstanceOf[ElbFileOffset].n
    listing().slice(s, e).map(ElbFilePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ElbReaderFactory(required.fieldNames, pushed, conf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class ElbReaderFactory(fieldNames: Array[String], pushed: Array[Filter],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ElbPartitionReader(partition.asInstanceOf[ElbFilePartition].path,
      fieldNames, pushed, conf)
}

/** Streams one log file; emits only the required fields, dropping rows
  * that fail a pushed filter before any row materializes.
  */
class ElbPartitionReader(pathStr: String, fieldNames: Array[String],
    pushed: Array[Filter], conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  // required-field → raw-column index; -1 = the file-path column
  private val fieldIdx: Array[Int] =
    fieldNames.map(n => ElbSchema.rawColumns.indexOf(n))
  private val pathUtf8 = UTF8String.fromString(pathStr)

  // pushed filters compiled to (raw index, predicate on the token)
  private val preds: Array[(Int, String => Boolean)] = pushed.map {
    case EqualTo(a, v: String) => ElbSchema.rawColumns.indexOf(a) ->
      ((t: String) => t == v)
    case In(a, vs) =>
      val set = vs.map(_.asInstanceOf[String]).toSet
      ElbSchema.rawColumns.indexOf(a) -> ((t: String) => set.contains(t))
    case IsNotNull(a) => ElbSchema.rawColumns.indexOf(a) ->
      ((_: String) => true) // non-null check is the null guard below
    case StringStartsWith(a, p) => ElbSchema.rawColumns.indexOf(a) ->
      ((t: String) => t.startsWith(p))
    case StringContains(a, s) => ElbSchema.rawColumns.indexOf(a) ->
      ((t: String) => t.contains(s))
    case f => throw new IllegalStateException(s"unpushable filter $f")
  }

  private def passes(toks: Array[String]): Boolean = {
    var i = 0
    while (i < preds.length) {
      val (idx, p) = preds(i)
      val t = toks(idx)
      if (t == null || !p(t)) return false
      i += 1
    }
    true
  }

  private lazy val reader: BufferedReader = {
    val hp = new Path(pathStr)
    val fs = hp.getFileSystem(conf.value)
    val raw = fs.open(hp)
    val in = if (pathStr.endsWith(".gz")) new GZIPInputStream(raw) else raw
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      val toks = ElbLineTokenizer.splitLine(line, ElbSchema.rawColumns.length)
      if (passes(toks)) {
        val vals = new Array[Any](fieldIdx.length)
        var i = 0
        while (i < fieldIdx.length) {
          val idx = fieldIdx(i)
          vals(i) =
            if (idx < 0) pathUtf8
            else if (toks(idx) == null) null
            else UTF8String.fromString(toks(idx))
          i += 1
        }
        current = new GenericInternalRow(vals)
        return true
      }
      line = reader.readLine()
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** `from_csv(sep=" ", quote='"', escape='\')` quoting semantics as a
  * single JVM pass (see [[ElbDataSource]] scaladoc for the pinned
  * rule set). Returns a fixed-width array; absent tail fields null.
  */
object ElbLineTokenizer {
  def splitLine(line: String, width: Int): Array[String] = {
    val out = new ArrayBuffer[String](width)
    val n = line.length
    var i = 0
    while (i < n && out.length < width) {
      if (line.charAt(i) == '"') {
        val qstart = i
        i += 1
        val sb = new java.lang.StringBuilder
        var closed = false
        while (i < n && !closed) {
          val c = line.charAt(i)
          if (c == '\\' && i + 1 < n &&
              (line.charAt(i + 1) == '"' || line.charAt(i + 1) == '\\')) {
            sb.append(line.charAt(i + 1)); i += 2
          } else if (c == '"') { closed = true; i += 1 }
          else { sb.append(c); i += 1 }
        }
        if (!closed) {
          // unclosed quote: rest of line, escapes already applied
          out += sb.toString; i = n
        } else if (i >= n) { out += sb.toString }
        else if (line.charAt(i) == ' ') { out += sb.toString; i += 1 }
        else {
          // garbage after the closing quote: revert to RAW text (quotes
          // kept) from the original field start to the next separator
          val j = line.indexOf(' ', i)
          if (j < 0) { out += line.substring(qstart); i = n }
          else { out += line.substring(qstart, j); i = j + 1 }
        }
      } else {
        val j = line.indexOf(' ', i)
        val end = if (j < 0) n else j
        val f = line.substring(i, end)
        out += (if (f.isEmpty) null else f)
        i = end + 1
      }
    }
    val res = new Array[String](width)
    var k = 0
    while (k < out.length && k < width) { res(k) = out(k); k += 1 }
    res
  }
}
