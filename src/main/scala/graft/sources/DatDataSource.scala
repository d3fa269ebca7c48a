package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for `::`-delimited `.dat` files (the
  * reference's MovieLens format, `Explorativa1_pyspark.ipynb:59`) —
  * the from-scratch source-extension path SURVEY §2.1 S1 needs when
  * the built-in CSV reader can't serve (it ignores per-line `encoding`,
  * mangling latin-1 titles).
  *
  * Scale design, explicitly:
  *  - **Byte-range splits**: every file larger than `splitBytes`
  *    (default 32 MB) fans out into multiple [[InputPartition]]s using
  *    the TextInputFormat ownership rule — a split reads the lines
  *    starting in `(start, end]` (first split: `[0, end]`), so a
  *    1000-executor cluster scans one huge .dat file fully in
  *    parallel with no coordination.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *    the requested fields (plus pushed-filter fields) are parsed and
  *    cast; a 2-column projection of a 20-field file does 2 casts per
  *    line, and the scan's `readSchema` proves it in `explain`.
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparison /
  *    null / IN / prefix predicates are evaluated inside the reader
  *    before row materialization, so filtered lines never allocate an
  *    [[InternalRow]] and never cross the scan boundary.
  *
  * Charset is an option (default ISO-8859-1). Byte-range splitting is
  * sound for any charset that never embeds 0x0A inside a multi-byte
  * character — true for single-byte charsets and UTF-8.
  *
  * Parsing is PERMISSIVE: short lines and failed casts yield null
  * fields, matching [[graft.etl.MovieLens.readDat]].
  */
class DatDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graftdat"

  override def supportsExternalMetadata(): Boolean = true

  /** Schema fallback when the user supplies none: all-string f0..fN
    * sized from the first line of the first file.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val delim = DatOptions.delimiter(options.asScala.toMap)
    val path = DatOptions.path(options.asScala.toMap)
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val file = if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getPath).sortBy(_.getName).head
    else p
    val in = fs.open(file)
    val head = try {
      val buf = new Array[Byte](64 * 1024)
      val n = math.max(in.read(buf), 0)
      val s = new String(buf, 0, n,
        DatOptions.charset(options.asScala.toMap))
      s.takeWhile(_ != '\n')
    } finally in.close()
    val nFields = head.split(java.util.regex.Pattern.quote(delim), -1).length
    StructType((0 until nFields).map(i => StructField(s"f$i", StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DatTable(schema, properties.asScala.toMap)
}

private object DatOptions {
  def path(opts: Map[String, String]): String =
    opts.getOrElse("path",
      throw new IllegalArgumentException("graftdat requires a path"))
  def delimiter(opts: Map[String, String]): String =
    opts.getOrElse("delimiter", "::")
  def charset(opts: Map[String, String]): String =
    opts.getOrElse("charset", "ISO-8859-1")
  def splitBytes(opts: Map[String, String]): Long =
    opts.getOrElse("splitbytes", (32L * 1024 * 1024).toString).toLong
}

private class DatTable(tableSchema: StructType, options: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"graftdat:${DatOptions.path(options)}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new DatScanBuilder(tableSchema,
      options ++ caseInsensitive.asScala.map { case (k, v) => k.toLowerCase -> v })
}

private class DatScanBuilder(tableSchema: StructType, options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull |
         _: In | _: StringStartsWith =>
      // every referenced column must exist in the table schema
      f.references.forall(tableSchema.fieldNames.contains)
    case _ => false
  }

  /** Accepted filters are FULLY handled in the reader (Spark drops
    * them from the post-scan Filter); the rest are returned for Spark
    * to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(supported)
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new DatScan(tableSchema, required, pushed, options)
}

private class DatScan(tableSchema: StructType, required: StructType,
    pushed: Array[Filter], options: Map[String, String])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftDatScan(path=${DatOptions.path(options)}, " +
      s"ReadSchema=[${required.fieldNames.mkString(",")}], " +
      s"PushedFilters=[${pushed.mkString(", ")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(DatOptions.path(options))
    val fs = p.getFileSystem(new Configuration())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && s.getLen > 0)
          .sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(p))
    val splitBytes = math.max(DatOptions.splitBytes(options), 64L * 1024)
    files.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map { i =>
        val start = i * splitBytes
        DatInputPartition(st.getPath.toString, start,
          math.min(splitBytes, len - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DatReaderFactory(tableSchema, required, pushed,
      DatOptions.delimiter(options), DatOptions.charset(options))
}

private case class DatInputPartition(file: String, start: Long, length: Long)
    extends InputPartition

private class DatReaderFactory(tableSchema: StructType, required: StructType,
    pushed: Array[Filter], delimiter: String, charset: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DatInputPartition]
    new DatPartitionReader(p, tableSchema, required, pushed, delimiter, charset)
  }
}

/** Reads the lines owned by one byte-range split, parses only the
  * needed fields, applies pushed filters pre-materialization.
  */
private class DatPartitionReader(part: DatInputPartition,
    tableSchema: StructType, required: StructType, pushed: Array[Filter],
    delimiter: String, charset: String)
    extends PartitionReader[InternalRow] {

  private val cs = java.nio.charset.Charset.forName(charset)
  private val splitRe = java.util.regex.Pattern.quote(delimiter)

  // fields that must be parsed: required output + pushed-filter refs
  private val neededNames: Array[String] =
    (required.fieldNames ++ pushed.flatMap(_.references)).distinct
  private val neededIdx: Array[Int] =
    neededNames.map(tableSchema.fieldIndex)
  private val neededTypes: Array[DataType] =
    neededIdx.map(tableSchema.fields(_).dataType)
  private val outPos: Array[Int] = // position of each required col in needed
    required.fieldNames.map(n => neededNames.indexOf(n))

  private val fs = new Path(part.file).getFileSystem(new Configuration())
  private val in = fs.open(new Path(part.file))
  private val end = part.start + part.length
  private var pos: Long = part.start
  private val buffered = {
    in.seek(part.start)
    new java.io.BufferedInputStream(in, 256 * 1024)
  }
  // ownership rule: a non-first split skips the (possibly partial)
  // line in progress at `start`; the previous split reads through it.
  if (part.start > 0) readLineBytes()

  private var row: InternalRow = _

  /** Reads one line's bytes (without terminator), advancing pos past
    * the terminator. Returns null at EOF with no bytes.
    */
  private def readLineBytes(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    var b = buffered.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') {
      out.write(b)
      b = buffered.read()
    }
    pos += out.size() + (if (b == '\n') 1 else 0)
    val bytes = out.toByteArray
    if (bytes.nonEmpty && bytes.last == '\r') bytes.dropRight(1) else bytes
  }

  private def parseField(raw: String, dt: DataType): Any = dt match {
    case StringType => raw
    case IntegerType => raw.toIntOption.orNull
    case LongType => raw.toLongOption.orNull
    case DoubleType => raw.toDoubleOption.orNull
    case BooleanType => raw.toBooleanOption.orNull
    case other =>
      throw new UnsupportedOperationException(s"graftdat: $other")
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue())
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new UnsupportedOperationException(s"compare $a $b")
  }

  private def eval(f: Filter, get: String => Any): Boolean = f match {
    case IsNull(c) => get(c) == null
    case IsNotNull(c) => get(c) != null
    case EqualTo(c, v) => get(c) != null && cmp(get(c), v) == 0
    case GreaterThan(c, v) => get(c) != null && cmp(get(c), v) > 0
    case GreaterThanOrEqual(c, v) => get(c) != null && cmp(get(c), v) >= 0
    case LessThan(c, v) => get(c) != null && cmp(get(c), v) < 0
    case LessThanOrEqual(c, v) => get(c) != null && cmp(get(c), v) <= 0
    case In(c, vs) => get(c) != null && vs.exists(v => cmp(get(c), v) == 0)
    case StringStartsWith(c, v) =>
      get(c) != null && get(c).asInstanceOf[String].startsWith(v)
    case other => throw new IllegalStateException(s"unpushable $other")
  }

  override def next(): Boolean = {
    // only lines STARTING at positions <= end belong to this reader
    // (the skip-first-line rule above makes the lower bound exclusive
    // for non-first splits) — mirrors Hadoop's LineRecordReader
    while (true) {
      if (pos > end) return false
      val bytes = readLineBytes()
      if (bytes == null) return false
      val line = new String(bytes, cs)
      val fields = line.split(splitRe, -1)
      val values = new Array[Any](neededIdx.length)
      var i = 0
      while (i < neededIdx.length) {
        val fi = neededIdx(i)
        values(i) =
          if (fi < fields.length) parseField(fields(fi), neededTypes(i))
          else null
        i += 1
      }
      def get(name: String): Any = values(neededNames.indexOf(name))
      if (pushed.forall(eval(_, get))) {
        val out = new GenericInternalRow(outPos.length)
        var j = 0
        while (j < outPos.length) {
          val v = values(outPos(j))
          out.update(j, v match {
            case s: String => UTF8String.fromString(s)
            case other => other
          })
          j += 1
        }
        row = out
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}
