package graft.spark

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, struct, transform, when}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/**
 * NESTED-FIELD schema evolution algebra — the struct-typed half of the
 * engine's additive evolution (the Delta nested `ADD COLUMN s.x` /
 * autoMerge-struct contract):
 *
 *  - [[addField]] widens a declared schema with a new NULLABLE field at an
 *    arbitrary struct path (`s.x`, `a.b.c`), appended at its parent's end
 *    — the exact shape [[GraftTableCatalog.alterTable]] accepts;
 *  - [[isWidening]] decides whether one type is an ADDITIVE widening of
 *    another (same type, or a struct whose fields all carry over with
 *    widening types — extra fields allowed on the wide side; arrays widen
 *    element-wise). This is what lets a MERGE source's struct column with
 *    an extra nested field count as evolution rather than a type clash;
 *  - [[conform]] lifts a column of the narrow type to the wide type by
 *    REBUILDING the struct: carried fields keep their values (recursively
 *    conformed), missing fields inject typed NULLs, and a NULL struct
 *    stays NULL (a naive `struct(...)` would resurrect it as a non-null
 *    struct of NULLs). Field order follows the WIDE type, so unions line
 *    up by position too.
 *
 * A plain `Cast` cannot serve any of this: Catalyst struct casts require
 * identical field counts, so the first old-file row after a nested add
 * would kill the read. Everything here is column-expression algebra —
 * codegen'd, no UDFs, no extra passes.
 */
object StructEvolution {

  /** Append nullable `dt` at `path` (parents name structs, or step
    * through arrays/map values via `element`/`value` segments —
    * `arr.element.x` appends a field to the struct inside an
    * `array<struct>`; old files read it as a typed NULL per element).
    * Returns the widened schema; refuses unknown parents, unaddressable
    * parents, map-KEY paths (a key gaining a field would split old and
    * new key identities), and name collisions. */
  def addField(base: StructType, path: Seq[String], dt: DataType): StructType = {
    require(path.nonEmpty, "empty field path")
    require(!path.dropRight(1).exists(_.equalsIgnoreCase("key")),
      s"cannot add ${path.mkString(".")}: fields cannot be added inside " +
        "map KEYS (old and new key identities would diverge)")
    val name = path.last
    def walk(cur: DataType, parents: Seq[String], walked: Seq[String]): DataType =
      (cur, parents) match {
        case (st: StructType, Seq()) =>
          require(!st.fieldNames.exists(_.equalsIgnoreCase(name)),
            s"field ${(walked :+ name).mkString(".")} already exists")
          StructType(st.fields :+ StructField(name, dt, nullable = true))
        case (other, Seq()) => throw new IllegalArgumentException(
          s"column ${walked.mkString(".")} is ${other.catalogString}, " +
            "not a struct — nested ADD COLUMN requires a struct parent")
        case (st: StructType, head +: rest) =>
          val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(head))
          require(idx >= 0,
            s"no such column ${(walked :+ head).mkString(".")}")
          StructType(st.fields.updated(
            idx, st.fields(idx).copy(
              dataType = walk(st.fields(idx).dataType, rest, walked :+ head))))
        case (at: ArrayType, head +: rest) if head.equalsIgnoreCase("element") =>
          at.copy(elementType = walk(at.elementType, rest, walked :+ head))
        case (mt: org.apache.spark.sql.types.MapType, head +: rest)
            if head.equalsIgnoreCase("value") =>
          mt.copy(valueType = walk(mt.valueType, rest, walked :+ head))
        case (other, head +: _) => throw new IllegalArgumentException(
          s"column ${walked.mkString(".")} is ${other.catalogString} — " +
            s"segment '$head' is not addressable in it")
      }
    walk(base, path.dropRight(1), Nil).asInstanceOf[StructType]
  }

  /** Rename the field at `path` to `to`, preserving its position —
    * `element`/`key`/`value` segments step through arrays and maps
    * ([[atParent]]), so `arr.element.x` renames inside an
    * `array<struct>`. Refuses unknown paths, unaddressable parents, and
    * collisions. */
  def renameField(base: StructType, path: Seq[String], to: String): StructType =
    atParent(base, path) { (st, name, walked) =>
      val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(idx >= 0, s"no such field ${(walked :+ name).mkString(".")}")
      require(!st.fieldNames.exists(_.equalsIgnoreCase(to)),
        s"field ${(walked :+ to).mkString(".")} already exists")
      StructType(st.fields.updated(idx, st.fields(idx).copy(name = to)))
    }

  /** Replace the type of the field at `path` (top-level or nested; an
    * `element` segment steps into an array's element type, so
    * `arr.element.x` addresses a struct field inside an array),
    * preserving name and position — the declared-schema side of nested
    * TYPE WIDENING ([[ColumnMapping.widen]] holds the legality rules).
    * Refuses unknown paths and unaddressable parents. */
  def setFieldType(base: StructType, path: Seq[String], dt: DataType): StructType = {
    require(path.nonEmpty, "empty field path")
    def walk(cur: DataType, segs: Seq[String], walked: Seq[String]): DataType =
      segs match {
        case Seq() => dt
        case head +: rest => cur match {
          case st: StructType =>
            val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(head))
            require(idx >= 0, s"no such field ${(walked :+ head).mkString(".")}")
            StructType(st.fields.updated(idx, st.fields(idx).copy(
              dataType = walk(st.fields(idx).dataType, rest, walked :+ head))))
          case at: ArrayType if head.equalsIgnoreCase("element") =>
            at.copy(elementType = walk(at.elementType, rest, walked :+ head))
          case mt: org.apache.spark.sql.types.MapType if head.equalsIgnoreCase("key") =>
            mt.copy(keyType = walk(mt.keyType, rest, walked :+ head))
          case mt: org.apache.spark.sql.types.MapType if head.equalsIgnoreCase("value") =>
            mt.copy(valueType = walk(mt.valueType, rest, walked :+ head))
          case other => throw new IllegalArgumentException(
            s"${walked.mkString(".")} is ${other.catalogString} — " +
              s"segment '$head' is not addressable in it")
        }
      }
    walk(base, path, Nil).asInstanceOf[StructType]
  }

  /** Drop the field at `path`. Refuses unknown paths, dropping a
    * struct's LAST field (an empty struct cannot be projected), and
    * paths inside map KEYS (dropping part of a key can collapse distinct
    * keys into duplicates). */
  def dropField(base: StructType, path: Seq[String]): StructType = {
    require(!path.dropRight(1).exists(_.equalsIgnoreCase("key")),
      s"cannot drop ${path.mkString(".")}: dropping a field inside map " +
        "KEYS could collapse distinct keys into duplicates")
    atParent(base, path) { (st, name, walked) =>
      val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(idx >= 0, s"no such field ${(walked :+ name).mkString(".")}")
      require(st.fields.length > 1,
        s"cannot drop ${(walked :+ name).mkString(".")}: it is the struct's " +
          "last field — drop the whole column instead")
      StructType(st.fields.patch(idx, Nil, 1))
    }
  }

  /** Walk to `path`'s parent struct and apply `f(parent, lastSegment,
    * walkedParents)` there, rebuilding the enclosing structs. `element` /
    * `key` / `value` segments step THROUGH arrays and maps (the Spark
    * nested addressing), so `arr.element.x` reaches a struct field inside
    * an `array<struct>`. */
  private def atParent(base: StructType, path: Seq[String])(
      f: (StructType, String, Seq[String]) => StructType): StructType = {
    require(path.nonEmpty, "empty field path")
    def walkType(dt: DataType, parents: Seq[String], walked: Seq[String]): DataType =
      (dt, parents) match {
        case (st: StructType, Seq()) => f(st, path.last, walked)
        case (other, Seq()) => throw new IllegalArgumentException(
          s"${walked.mkString(".")} is ${other.catalogString}, not a struct")
        case (st: StructType, head +: rest) =>
          val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(head))
          require(idx >= 0, s"no such column ${(walked :+ head).mkString(".")}")
          StructType(st.fields.updated(
            idx, st.fields(idx).copy(
              dataType = walkType(st.fields(idx).dataType, rest, walked :+ head))))
        case (at: ArrayType, head +: rest) if head.equalsIgnoreCase("element") =>
          at.copy(elementType = walkType(at.elementType, rest, walked :+ head))
        case (mt: org.apache.spark.sql.types.MapType, head +: rest)
            if head.equalsIgnoreCase("key") =>
          mt.copy(keyType = walkType(mt.keyType, rest, walked :+ head))
        case (mt: org.apache.spark.sql.types.MapType, head +: rest)
            if head.equalsIgnoreCase("value") =>
          mt.copy(valueType = walkType(mt.valueType, rest, walked :+ head))
        case (other, head +: _) => throw new IllegalArgumentException(
          s"column ${walked.mkString(".")} is ${other.catalogString} — " +
            s"segment '$head' is not addressable in it")
      }
    walkType(base, path.dropRight(1), Nil).asInstanceOf[StructType]
  }

  /** Is `to` an ADDITIVE widening of `from`? Equal types widen trivially;
    * structs widen when every `from` field exists in `to` (case-insensitive)
    * with a widening type — `to` may carry extra fields; arrays widen
    * element-wise. Maps and every other type must match exactly (numeric
    * widening is [[ColumnMapping.widen]]'s job, not this one's). */
  def isWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => true
    case (f: StructType, t: StructType) =>
      f.fields.forall { ff =>
        t.fields.find(_.name.equalsIgnoreCase(ff.name))
          .exists(tf => isWidening(ff.dataType, tf.dataType))
      }
    case (f: ArrayType, t: ArrayType) => isWidening(f.elementType, t.elementType)
    case _ => false
  }

  /** True when the pair is a PROPER struct widening — widening and not
    * merely equal (the evolution triggers' cheap predicate). */
  def isProperWidening(from: DataType, to: DataType): Boolean =
    from != to && isWidening(from, to)

  /** Lift column `c` of type `from` to type `to` (requires
    * `isWidening(from, to)`). Identity when the types already match. */
  def conform(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    case (f: StructType, t: StructType) =>
      val rebuilt = struct(t.fields.map { tf =>
        f.fields.find(_.name.equalsIgnoreCase(tf.name)) match {
          case Some(ff) => conform(c.getField(ff.name), ff.dataType, tf.dataType).as(tf.name)
          case None     => lit(null).cast(tf.dataType).as(tf.name)
        }
      }.toIndexedSeq: _*)
      when(c.isNull, lit(null).cast(t)).otherwise(rebuilt)
    case (f: ArrayType, t: ArrayType) =>
      transform(c, x => conform(x, f.elementType, t.elementType))
    case (f, t) => throw new IllegalArgumentException(
      s"cannot conform ${f.catalogString} to ${t.catalogString}")
  }

  /** The struct-widening pairs between two schemas, by top-level column
    * name (lower-cased): source columns whose type properly widens the
    * current column's type. The evolution triggers (MERGE autoMerge, COPY
    * INTO) share this probe. */
  def widenedColumns(current: StructType, source: StructType): Map[String, DataType] =
    source.fields.flatMap { sf =>
      current.fields.find(_.name.equalsIgnoreCase(sf.name)) match {
        case Some(cf) if isProperWidening(cf.dataType, sf.dataType) =>
          Some(cf.name.toLowerCase(Locale.ROOT) -> nullableDeep(sf.dataType))
        case _ => None
      }
    }.toMap

  /** Every nested field nullable — evolution-added fields hold NULL for
    * pre-evolution rows, so the widened declaration must permit it. */
  private def nullableDeep(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = nullableDeep(f.dataType), nullable = true)))
    case at: ArrayType => at.copy(elementType = nullableDeep(at.elementType))
    case other => other
  }
}
