package graft.normalize

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Path segment of the normalizer field DSL: `name` or `name[idx]`. */
final case class PathSeg(name: String, index: Option[Int]) {
  def canonical: String = index.fold(name)(i => s"$name[$i]")
}

object PathParser {
  private val SegRe = """([^\[\].]+)(?:\[(\d+)\])?""".r

  /** Parse `"stores[0].gallery.deals.id"` into segments. Indices are
    * 0-based (reference: Go-slice indexing,
    * /root/reference/README.md:45 `stores[0].gallery.deals.id`). */
  def parse(path: String): Seq[PathSeg] = {
    require(path.nonEmpty, "empty normalizer path")
    path.split('.').toSeq.map {
      case SegRe(name, null) => PathSeg(name, None)
      case SegRe(name, idx)  => PathSeg(name, Some(idx.toInt))
      case other => throw new IllegalArgumentException(
        s"bad normalizer path segment '$other' in '$path'")
    }
  }
}

/** Normalizer spec — parity with the reference's `WithNormalizer(fields,
  * aliases, failOnRangeError)` (/root/reference/quacfka.go:106-120).
  *
  * Semantics (/root/reference/README.md:111-131):
  *  - dotted path → nested scalar projection (`site.id`);
  *  - `name[i]` → element access; out-of-range → NULL, or error when
  *    `failOnRangeError` (the reference's range-error flag);
  *  - un-indexed list path → one output row PER ELEMENT with scalar
  *    columns repeated; an EMPTY list yields exactly one row with NULL
  *    in the list-derived columns (= Spark `explode_outer`);
  *  - `aliases` rename output columns (default: path with separators
  *    mapped to `_`).
  */
final case class NormalizerSpec(
    fields: Seq[String],
    aliases: Seq[String] = Nil,
    failOnRangeError: Boolean = false) {
  require(aliases.isEmpty || aliases.length == fields.length,
    s"aliases length ${aliases.length} != fields length ${fields.length}")
  def outputNames: Seq[String] =
    if (aliases.nonEmpty) aliases
    else fields.map(_.replaceAll("""[\[\]]""", "").replace('.', '_'))
}

/** Flatten/unnest projection over nested columns — the reference's
  * normalizer (N1 in SURVEY.md §2) as a pure Catalyst projection:
  * path resolution compiles to `getField`/`get`/`explode_outer`, so
  * predicate pushdown, column pruning and whole-stage codegen all
  * apply. No shuffle is introduced — at 100 TB this stays a map-only
  * stage fused with the scan.
  *
  * Fields sharing an un-indexed list prefix share ONE explode (aligned
  * elements). Distinct un-indexed lists chain explodes → cross product
  * (the reference documents only a single list path; we generalize).
  */
object Normalizer {

  def normalize(df: DataFrame, spec: NormalizerSpec): DataFrame = {
    val parsed = spec.fields.map(PathParser.parse)

    // Discover explode points (prefixes ending in an un-indexed array),
    // in first-seen order; nested ones sort after their parents because
    // they have strictly more segments.
    val explodePoints = mutable.LinkedHashMap[String, Seq[PathSeg]]()
    parsed.foreach { segs =>
      explodePrefixes(df.schema, segs).foreach { p =>
        explodePoints.getOrElseUpdate(canonical(p), p)
      }
    }
    val ordered = explodePoints.values.toSeq.sortBy(_.length)

    // Materialize each explode point as a hidden temp column.
    val explodeMap = mutable.LinkedHashMap[String, String]() // canonical -> temp col
    var cur = df
    ordered.zipWithIndex.foreach { case (segs, i) =>
      val tmp = s"__graft_ex_$i"
      val (arrCol, _) = resolve(df.schema, segs, explodeMap,
        spec.failOnRangeError, terminalArrayAsValue = true)
      cur = cur.withColumn(tmp, explode_outer(arrCol))
      explodeMap += canonical(segs) -> tmp
    }

    val cols = parsed.zip(spec.outputNames).map { case (segs, name) =>
      val (c, _) = resolve(df.schema, segs, explodeMap,
        spec.failOnRangeError, terminalArrayAsValue = false)
      c.as(name)
    }
    cur.select(cols: _*)
  }

  /** Derive the flat output schema of `normalize(df, spec)` without
    * running it — parity with the reference's normalizer-schema
    * derivation ("The Arrow field types of the selected fields will be
    * used to build the new schema",
    * /root/reference/quacfka.go:110-111). Un-indexed list paths
    * resolve to their ELEMENT type (the per-row fan-out type); all
    * outputs are nullable (empty-list ⇒ NULL-row semantics). */
  def normalizedSchema(schema: StructType, spec: NormalizerSpec): StructType = {
    val fields = spec.fields.map(PathParser.parse)
      .zip(spec.outputNames).map { case (segs, name) =>
        var dt: DataType = schema
        segs.foreach { seg =>
          dt = structField(dt, seg, segs) match {
            case ArrayType(elem, _) => elem // indexed OR exploded element
            case other => other
          }
        }
        StructField(name, dt, nullable = true)
      }
    StructType(fields)
  }

  private def canonical(segs: Seq[PathSeg]): String =
    segs.map(_.canonical).mkString(".")

  /** All prefixes of `segs` that end at an un-indexed array field
    * (each such prefix is one explode). The terminal segment counts:
    * an un-indexed terminal array also fans out per element. */
  private def explodePrefixes(
      schema: StructType, segs: Seq[PathSeg]): Seq[Seq[PathSeg]] = {
    val out = mutable.Buffer[Seq[PathSeg]]()
    var dt: DataType = schema
    segs.zipWithIndex.foreach { case (seg, i) =>
      dt = structField(dt, seg, segs)
      dt match {
        case ArrayType(elem, _) =>
          if (seg.index.isDefined) dt = elem
          else { out += segs.take(i + 1); dt = elem }
        case _ => ()
      }
    }
    out.toSeq
  }

  /** Descend one struct field; clear error if the path is invalid. */
  private def structField(
      dt: DataType, seg: PathSeg, full: Seq[PathSeg]): DataType = dt match {
    case st: StructType =>
      st.fields.find(_.name == seg.name).map(_.dataType).getOrElse {
        throw new IllegalArgumentException(
          s"normalizer path '${canonical(full)}': no field '${seg.name}' " +
          s"in struct [${st.fieldNames.mkString(", ")}]")
      }
    case other => throw new IllegalArgumentException(
      s"normalizer path '${canonical(full)}': cannot descend into " +
      s"${other.simpleString} at '${seg.name}'")
  }

  /** Element type of the array at explode point `segs`. */
  private def arrayElementType(
      schema: StructType, segs: Seq[PathSeg]): DataType = {
    var dt: DataType = schema
    segs.foreach { seg =>
      dt = structField(dt, seg, segs) match {
        case ArrayType(elem, _) => elem
        case other => other
      }
    }
    dt
  }

  /** Resolve a parsed path to a Column against `cur` (which already
    * holds temp columns for materialized explode points). */
  private def resolve(
      rootSchema: StructType,
      segs: Seq[PathSeg],
      explodeMap: mutable.LinkedHashMap[String, String],
      strict: Boolean,
      terminalArrayAsValue: Boolean): (Column, DataType) = {

    // Longest prefix already materialized as an exploded temp column.
    val start = (segs.length to 1 by -1).find { k =>
      explodeMap.contains(canonical(segs.take(k)))
    }.getOrElse(0)

    var c: Column = null
    var dt: DataType = rootSchema
    if (start > 0) {
      val key = canonical(segs.take(start))
      c = col(explodeMap(key))
      dt = arrayElementType(rootSchema, segs.take(start))
    }

    segs.drop(start).zipWithIndex.foreach { case (seg, j) =>
      val isTerminal = start + j == segs.length - 1
      dt = structField(dt, seg, segs)
      c = if (c == null) col(seg.name) else c.getField(seg.name)
      dt match {
        case ArrayType(elem, _) =>
          seg.index match {
            case Some(i) =>
              c = elementAt(c, i, strict, canonical(segs))
              dt = elem
            case None =>
              if (isTerminal && terminalArrayAsValue) {
                // caller wants the raw array (explode-point materialization)
              } else if (!isTerminal || !terminalArrayAsValue) {
                throw new IllegalStateException(
                  s"un-indexed array '${seg.name}' in '${canonical(segs)}' " +
                  "not materialized as explode point (internal)")
              }
          }
        case _ => ()
      }
    }
    (c, dt)
  }

  /** 0-based element access. Lenient → NULL out of range (`get`);
    * strict → raise, matching `failOnRangeError`
    * (/root/reference/quacfka.go:114-119). NULL arrays stay NULL. */
  private def elementAt(
      arr: Column, idx: Int, strict: Boolean, path: String): Column =
    if (!strict) get(arr, lit(idx))
    else when(arr.isNotNull && size(arr) <= lit(idx),
        raise_error(lit(s"normalizer range error: index $idx out of " +
          s"range in path '$path'")))
      .otherwise(get(arr, lit(idx)))
}
