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

  /** Append nullable `dt` at `path` (parent path must name structs all the
    * way down). Returns the widened schema; refuses unknown parents,
    * non-struct parents, and name collisions. */
  def addField(base: StructType, path: Seq[String], dt: DataType): StructType = {
    require(path.nonEmpty, "empty field path")
    val name = path.last
    def walk(st: StructType, parents: Seq[String], walked: Seq[String]): StructType =
      parents match {
        case Seq() =>
          require(!st.fieldNames.exists(_.equalsIgnoreCase(name)),
            s"field ${(walked :+ name).mkString(".")} already exists")
          StructType(st.fields :+ StructField(name, dt, nullable = true))
        case head +: rest =>
          val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(head))
          require(idx >= 0,
            s"no such column ${(walked :+ head).mkString(".")}")
          st.fields(idx).dataType match {
            case inner: StructType =>
              val widened = walk(inner, rest, walked :+ head)
              StructType(st.fields.updated(
                idx, st.fields(idx).copy(dataType = widened)))
            case other => throw new IllegalArgumentException(
              s"column ${(walked :+ head).mkString(".")} is ${other.catalogString}, " +
                "not a struct — nested ADD COLUMN requires struct parents")
          }
      }
    walk(base, path.dropRight(1), Nil)
  }

  /** Rename the field at `path` to `to`, preserving its position. Refuses
    * unknown paths, non-struct parents, and collisions. */
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

  /** Drop the field at `path`. Refuses unknown paths and dropping a
    * struct's LAST field (an empty struct cannot be projected). */
  def dropField(base: StructType, path: Seq[String]): StructType =
    atParent(base, path) { (st, name, walked) =>
      val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(idx >= 0, s"no such field ${(walked :+ name).mkString(".")}")
      require(st.fields.length > 1,
        s"cannot drop ${(walked :+ name).mkString(".")}: it is the struct's " +
          "last field — drop the whole column instead")
      StructType(st.fields.patch(idx, Nil, 1))
    }

  /** Walk to `path`'s parent struct and apply `f(parent, lastSegment,
    * walkedParents)` there, rebuilding the enclosing structs. */
  private def atParent(base: StructType, path: Seq[String])(
      f: (StructType, String, Seq[String]) => StructType): StructType = {
    require(path.nonEmpty, "empty field path")
    def walk(st: StructType, parents: Seq[String], walked: Seq[String]): StructType =
      parents match {
        case Seq() => f(st, path.last, walked)
        case head +: rest =>
          val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(head))
          require(idx >= 0, s"no such column ${(walked :+ head).mkString(".")}")
          st.fields(idx).dataType match {
            case inner: StructType =>
              StructType(st.fields.updated(
                idx, st.fields(idx).copy(dataType = walk(inner, rest, walked :+ head))))
            case other => throw new IllegalArgumentException(
              s"column ${(walked :+ head).mkString(".")} is ${other.catalogString}, " +
                "not a struct")
          }
      }
    walk(base, path.dropRight(1), Nil)
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
