package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.parquet.schema.{GroupType, MessageType, Type => PType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Impala's parquet LIST-encoding path resolution
  * (`be/src/exec/parquet/parquet-metadata-utils.cc` ResolvePathHelper,
  * IMPALA-4725): a logical `array<struct<...>>` column resolves
  * against the file's physical tree under a chosen array-encoding
  * policy — TWO_LEVEL (the repeated group IS the element), THREE_LEVEL
  * (the element sits one level below the repeated group), or
  * TWO_LEVEL_THEN_THREE_LEVEL (per-path: try 2-level, fall back) —
  * combined with NAME or POSITION field matching. A mismatched policy
  * yields Impala's *defined* wrong answers (fields resolving onto
  * other fields' data, missing fields as NULL, a primitive slot
  * hitting a parquet group as an error), which the
  * parquet-ambiguous-list goldens pin exactly.
  *
  * Spark-first mapping: Spark's own reader auto-detects the real
  * encoding, so the file is read ONCE, correctly; each policy's view
  * is a pure `transform(...)` projection over the true element struct
  * (codegen'd, no custom scan) that rewires every logical leaf to the
  * physical leaf Impala would have bound — or NULL. The footer walk is
  * driver-side metadata.
  */
object ParquetArrayResolution {

  sealed trait ArrayRes
  case object TwoLevel extends ArrayRes
  case object ThreeLevel extends ArrayRes
  case object TwoThenThree extends ArrayRes

  def parseArrayRes(s: String): ArrayRes = s.toLowerCase match {
    case "two_level" => TwoLevel
    case "three_level" => ThreeLevel
    case _ => TwoThenThree
  }

  private sealed trait Outcome
  private case class Resolved(relPath: Seq[String]) extends Outcome
  private case object Missing extends Outcome
  private case class Incompatible(msg: String) extends Outcome

  private def footerSchema(spark: SparkSession,
      file: String): MessageType = {
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** The file's ACTUAL element node (what a correct reader binds):
    * 2-level when the repeated node is named `array`/`*_tuple` or has
    * more than one field; else the single child of the repeated group.
    */
  private def trueElement(arrayNode: GroupType): (PType, Int) = {
    val repeated = arrayNode.getFields.get(0)
    val isTwoLevel = !repeated.isPrimitive && {
      val g = repeated.asGroupType()
      g.getFieldCount != 1 || g.getName == "array" ||
        g.getName.endsWith("_tuple")
    } || repeated.isPrimitive
    if (isTwoLevel) (repeated, 1) else (repeated.asGroupType().getType(0), 2)
  }

  /** Element node under the POLICY's interpretation (not the truth). */
  private def policyElement(arrayNode: GroupType,
      threeLevel: Boolean): Option[(PType, Int)] = {
    if (arrayNode.getFieldCount < 1) return None
    val repeated = arrayNode.getFields.get(0)
    if (!threeLevel) Some((repeated, 1))
    else if (repeated.isPrimitive) None
    else if (repeated.asGroupType().getFieldCount < 1) None
    else Some((repeated.asGroupType().getType(0), 2))
  }

  /** Resolve one logical leaf path (relative to the array element)
    * against the policy's element node. Returns the physical path
    * RELATIVE to `node`.
    */
  private def resolveLeaf(node: PType, logicalParent: StructType,
      path: Seq[String], byName: Boolean): Outcome = {
    if (path.isEmpty) return Resolved(Nil)
    if (node.isPrimitive) return Missing // cannot descend further
    val g = node.asGroupType()
    val fieldName = path.head
    val logicalIdx = logicalParent.fields
      .indexWhere(_.name.equalsIgnoreCase(fieldName))
    val child: Option[PType] =
      if (byName) g.getFields.asScala.find(
        _.getName.equalsIgnoreCase(fieldName))
      else if (logicalIdx >= 0 && logicalIdx < g.getFieldCount)
        Some(g.getType(logicalIdx))
      else None
    child match {
      case None => Missing
      case Some(c) =>
        val logicalChild = logicalParent.fields(logicalIdx).dataType
        if (path.length == 1) {
          if (!c.isPrimitive)
            Incompatible(s"file has an incompatible Parquet schema: " +
              s"'$fieldName' matches a Parquet group")
          else Resolved(Seq(c.getName))
        } else logicalChild match {
          case st: StructType =>
            resolveLeaf(c, st, path.tail, byName) match {
              case Resolved(rel) => Resolved(c.getName +: rel)
              case other => other
            }
          case _ => Missing
        }
    }
  }

  /** All logical leaf paths of a struct. */
  private def leafPaths(st: StructType,
      prefix: Seq[String] = Nil): Seq[Seq[String]] =
    st.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => leafPaths(s, prefix :+ f.name)
        case _ => Seq(prefix :+ f.name)
      }
    }

  /** Build the policy view of `file` for a single-column logical
    * schema `colName array<struct<...>>`. A leaf Impala would REJECT
    * (a primitive slot binding a parquet group — the CATCH goldens)
    * projects as NULL here: the error path is an analysis-time
    * rejection in the reference, not a data outcome.
    */
  /** Leaves the CURRENT projection could not resolve because a
    * primitive slot matched a Parquet GROUP: viewName → (leafName,
    * scanner message). Re-written on every [[project]] call with a
    * non-empty `viewName`; the dialect rejects a query that extracts
    * one of these leaves (Impala's incompatible-schema error fires
    * only when the slot is actually materialized).
    */
  val incompatLeaves = scala.collection.mutable.LinkedHashMap
    .empty[String, Seq[(String, String)]]

  def project(spark: SparkSession, file: String, colName: String,
      elemType: StructType, byName: Boolean,
      arrayRes: ArrayRes, viewName: String = ""): DataFrame = {
    val msg = footerSchema(spark, file)
    // top-level column: NAME matches case-insensitively, POSITION is
    // ordinal 0 of a one-column table — the same node either way here
    val colNode = msg.getFields.asScala
      .find(_.getName.equalsIgnoreCase(colName))
      .getOrElse(msg.getFields.get(0))
    require(!colNode.isPrimitive, s"$colName not a group in $file")
    val arrayNode = colNode.asGroupType()
    val (trueElem, _) = trueElement(arrayNode)

    def resolveAll(threeLevel: Boolean): Map[Seq[String], Outcome] = {
      policyElement(arrayNode, threeLevel) match {
        case None => leafPaths(elemType).map(_ -> (Missing: Outcome)).toMap
        case Some((elemNode, _)) =>
          leafPaths(elemType).map { p =>
            p -> resolveLeaf(elemNode, elemType, p, byName)
          }.toMap
      }
    }
    val outcomes: Map[Seq[String], Outcome] = arrayRes match {
      case TwoLevel => resolveAll(threeLevel = false)
      case ThreeLevel => resolveAll(threeLevel = true)
      case TwoThenThree =>
        val two = resolveAll(threeLevel = false)
        val three = resolveAll(threeLevel = true)
        two.map { case (p, o) =>
          p -> (o match {
            case Resolved(_) => o
            case _ => three(p) match {
              case r: Resolved => r
              case _ => o
            }
          })
        }
      }

    // a policy-resolved leaf maps back through the TRUE element: its
    // resolved node must live below it for the correct read to carry
    // the data (always the case for 2-vs-3-level skew — the policies
    // disagree only on how many wrapper levels to skip)
    def relToTrue(resolved: Seq[String],
        threeLevelPolicy: Boolean): Option[Seq[String]] = {
      val (_, trueDepth) = trueElement(arrayNode)
      val policyDepth = if (threeLevelPolicy) 2 else 1
      // path is relative to the POLICY element; prepend/strip the
      // depth difference through the file tree
      if (policyDepth == trueDepth) Some(resolved)
      else if (policyDepth < trueDepth) {
        // policy element is ABOVE the true element: first segment must
        // be the true element's own name
        if (resolved.nonEmpty &&
            resolved.head.equalsIgnoreCase(nameOf(trueElem)))
          Some(resolved.tail)
        else None
      } else {
        // policy element BELOW the true element: the policy element is
        // a child of the true element — prefix its name
        policyElement(arrayNode, threeLevelPolicy).map { case (n, _) =>
          nameOf(n) +: resolved
        }
      }
    }
    def nameOf(t: PType): String = t.getName

    // which interpretation produced each outcome (needed for depth)
    def depthOf(p: Seq[String]): Boolean = arrayRes match {
      case TwoLevel => false
      case ThreeLevel => true
      case TwoThenThree =>
        resolveAll(threeLevel = false)(p) match {
          case Resolved(_) => false
          case _ => true
        }
    }

    val df = spark.read.parquet(file)
    val trueCol = df.schema.fields
      .find(_.name.equalsIgnoreCase(colName)).get.name

    // build named_struct via SQL text for exact field naming
    def fieldSql(st: StructType, prefix: Seq[String]): String =
      st.fields.map { f =>
        val p = prefix :+ f.name
        val v = f.dataType match {
          case s: StructType => fieldSql(s, p)
          case dt =>
            outcomes(p) match {
              case Resolved(rel) =>
                relToTrue(rel, depthOf(p)) match {
                  case Some(segs) if segs.nonEmpty =>
                    s"CAST(x.${segs.map(s => s"`$s`").mkString(".")} AS ${dt.sql})"
                  case _ => s"CAST(NULL AS ${dt.sql})"
                }
              case Missing => s"CAST(NULL AS ${dt.sql})"
              // the reference rejects this path at analysis time
              // ("has an incompatible Parquet schema"); as data it
              // never materializes
              case Incompatible(_) => s"CAST(NULL AS ${dt.sql})"
            }
        }
        s"'${f.name}', $v"
      }.mkString("named_struct(", ", ", ")")

    if (viewName.nonEmpty)
      incompatLeaves(viewName.toLowerCase) = outcomes.toSeq.collect {
        case (path, Incompatible(m)) =>
          path.last ->
            (s"File '$file' has an incompatible Parquet schema for " +
              s"column '${(colName +: path).mkString(".")}': $m")
      }
    df.selectExpr(
      s"transform(`$trueCol`, x -> ${fieldSql(elemType, Nil)}) AS $colName")
  }
}
