package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Model-based properties for NESTED schema evolution (round 13,
  * SURVEY D46; generalized to DEPTH 2 in round 14): random
  * ADD/RENAME/WIDEN/DROP sequences on a struct column `s` AND on a
  * struct-in-struct `s.g` — including renames of `g` itself, which
  * must re-key every descendant mapping entry — interleaved with
  * appends and row deletes, run in parallel against a GraftTable and
  * an in-memory model. After EVERY op the table's read() must equal
  * the model (a re-added subfield name must read NULL on pre-drop
  * rows, never resurrected bytes — at either depth); after the
  * sequence, `schemaAt`/`readAt` of each recorded snapshot must
  * replay that snapshot's exact historical schema AND contents at
  * both levels. Both delete modes face the same workloads: COW
  * rewrites must spell physical subfield names correctly at every
  * depth when rewriting evolved structs.
  */
class NestedEvolutionPropSpec extends SparkSuite {

  private sealed trait Op
  private case class Ins(n: Int) extends Op
  // lvl 0 = subfields of s; lvl 1 = subfields of the inner struct s.g
  private case class AddF(lvl: Int, reuseDropped: Boolean) extends Op
  private case class RenameF(lvl: Int, pick: Int) extends Op
  private case class WidenF(lvl: Int, pick: Int) extends Op
  private case class DropF(lvl: Int, pick: Int) extends Op
  private case object RenameG extends Op
  private case class DelRows(pick: Int) extends Op

  private val genLvl: Gen[Int] = Gen.oneOf(0, 1)
  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.choose(1, 3).map(Ins),
    2 -> Gen.zip(genLvl, Gen.oneOf(true, false))
      .map { case (l, r) => AddF(l, r) },
    2 -> Gen.zip(genLvl, Gen.choose(0, 7))
      .map { case (l, p) => RenameF(l, p) },
    1 -> Gen.zip(genLvl, Gen.choose(0, 7))
      .map { case (l, p) => WidenF(l, p) },
    2 -> Gen.zip(genLvl, Gen.choose(0, 7))
      .map { case (l, p) => DropF(l, p) },
    1 -> Gen.const(RenameG),
    1 -> Gen.choose(0, 2).map(DelRows))

  private val genOps: Gen[List[Op]] =
    Gen.choose(6, 11).flatMap(n => Gen.listOfN(n, genOp))

  private val genMode: Gen[String] =
    Gen.oneOf("merge-on-read", "copy-on-write")

  /** One logical scalar subfield: stable identity (values key),
    * current logical name, INT vs widened-to-BIGINT. */
  private case class F(id: Int, name: String, wide: Boolean)

  /** Ordered children of struct `s`: scalars interleaved with the one
    * inner struct (adds APPEND, so g's position matters). */
  private sealed trait Child
  private case class Sc(f: F) extends Child
  private case object Gr extends Child

  private case class State(
      sChildren: Vector[Child], gName: String, gFields: Vector[F])

  private def runSequence(mode: String, ops: List[Op]): Boolean = {
    val wh = graft.ScratchDirs.create("graft-nested-prop-")
    val cat = new GraftCatalog(spark, wh)
    cat.createNamespace("default")
    val t = cat.createTable("default", "nested_t",
      StructType.fromDDL("id BIGINT, s STRUCT<f0: INT, f1: INT, " +
        "g: STRUCT<h0: INT, h1: INT>>"),
      Map("write.delete.mode" -> mode))
    var st = State(
      Vector(Sc(F(0, "f0", wide = false)), Sc(F(1, "f1", wide = false)),
        Gr),
      "g",
      Vector(F(100, "h0", wide = false), F(101, "h1", wide = false)))
    var nextFieldId = 2
    var nextGid = 102
    var nameCounter = 2
    var gCounter = 2
    var dropped = Map(0 -> Vector.empty[String], 1 -> Vector.empty[String])
    // rowId -> (fieldIdentity -> value), identities unique across both
    // levels; a field absent at insert time has no entry and must read
    // NULL forever (and after re-adds)
    var rows = Map.empty[Long, Map[Int, Long]]
    var nextRow = 0L
    var history = Vector.empty[(Long, State, Map[Long, Map[Int, Long]])]

    def scalars(s: State): Vector[F] =
      s.sChildren.collect { case Sc(f) => f }
    def gPath(s: State): String = s"s.${s.gName}"

    def structType(s: State): StructType = StructType(s.sChildren.map {
      case Sc(f) => StructField(f.name,
        if (f.wide) LongType else IntegerType)
      case Gr => StructField(s.gName, StructType(s.gFields.map(f =>
        StructField(f.name, if (f.wide) LongType else IntegerType))))
    })
    def curSchema = StructType(Seq(StructField("id", LongType),
      StructField("s", structType(st))))

    def cell(f: F, v: Long): Any =
      if (f.wide) java.lang.Long.valueOf(v)
      else java.lang.Integer.valueOf(v.toInt)

    def freshName(lvl: Int, reuseDropped: Boolean): String = {
      val live = (if (lvl == 0) scalars(st).map(_.name)
        else st.gFields.map(_.name)).toSet + st.gName
      if (reuseDropped && dropped(lvl).nonEmpty)
        dropped(lvl).find(n => !live(n)).getOrElse(mint(lvl))
      else mint(lvl)
    }
    def mint(lvl: Int): String =
      if (lvl == 0) { val n = s"f$nameCounter"; nameCounter += 1; n }
      else { val n = s"h$nameCounter"; nameCounter += 1; n }

    def check(label: String, got: Array[Row], s: State,
        want: Map[Long, Map[Int, Long]]): Unit = {
      assert(got.length == want.size,
        s"$label: ${got.length} rows, model has ${want.size}")
      got.foreach { r =>
        val id = r.getLong(0)
        val vals = want.getOrElse(id,
          throw new AssertionError(s"$label: unexpected row $id"))
        val outer = r.getStruct(1)
        def checkF(f: F, holder: Row, j: Int, where: String): Unit =
          vals.get(f.id) match {
            case Some(v) =>
              val g = if (f.wide) holder.getLong(j)
                else holder.getInt(j).toLong
              assert(g == v, s"$label: row $id $where.${f.name} " +
                s"(identity ${f.id}) read $g, want $v")
            case None => assert(holder.isNullAt(j),
              s"$label: row $id $where.${f.name} (identity ${f.id}) " +
                s"must be NULL, got ${holder.get(j)}")
          }
        s.sChildren.zipWithIndex.foreach {
          case (Sc(f), j) => checkF(f, outer, j, "s")
          case (Gr, j) =>
            val inner = outer.getStruct(j)
            s.gFields.zipWithIndex.foreach { case (f, k) =>
              checkF(f, inner, k, gPath(s))
            }
        }
      }
    }

    def checkNow(label: String): Unit =
      check(label, t.read().collect(), st, rows)

    def snap(): Unit = t.currentSnapshot.foreach { s =>
      history :+= ((s.snapshotId, st, rows))
    }

    ops.foreach { op =>
      op match {
      case Ins(n) =>
        val rws = (0 until n).map { _ =>
          val id = nextRow; nextRow += 1
          val all = (scalars(st) ++ st.gFields)
            .map(f => f.id -> (id * 1000 + f.id)).toMap
          rows += (id -> all)
          Row(id, Row(st.sChildren.map {
            case Sc(f) => cell(f, all(f.id))
            case Gr => Row(st.gFields.map(f => cell(f, all(f.id))): _*)
          }: _*))
        }
        t.append(spark.createDataFrame(rws.asJava, curSchema))
        snap()
      case AddF(0, reuse) =>
        val name = freshName(0, reuse)
        t.addNestedColumn("s", StructField(name, IntegerType))
        st = st.copy(sChildren =
          st.sChildren :+ Sc(F(nextFieldId, name, wide = false)))
        nextFieldId += 1
      case AddF(_, reuse) =>
        val name = freshName(1, reuse)
        t.addNestedColumn(gPath(st), StructField(name, IntegerType))
        st = st.copy(gFields =
          st.gFields :+ F(nextGid, name, wide = false))
        nextGid += 1
      case RenameF(0, pick) =>
        val fs = scalars(st)
        if (fs.nonEmpty) {
          val f = fs(pick % fs.size)
          val to = mint(0)
          t.renameNestedColumn("s", f.name, to)
          st = st.copy(sChildren = st.sChildren.map {
            case Sc(x) if x.id == f.id => Sc(x.copy(name = to))
            case c => c
          })
        }
      case RenameF(_, pick) =>
        val f = st.gFields(pick % st.gFields.size)
        val to = mint(1)
        t.renameNestedColumn(gPath(st), f.name, to)
        st = st.copy(gFields = st.gFields.map(x =>
          if (x.id == f.id) x.copy(name = to) else x))
      case WidenF(0, pick) =>
        val narrow = scalars(st).filter(!_.wide)
        if (narrow.nonEmpty) {
          val f = narrow(pick % narrow.size)
          t.widenNestedColumn("s", f.name, LongType)
          st = st.copy(sChildren = st.sChildren.map {
            case Sc(x) if x.id == f.id => Sc(x.copy(wide = true))
            case c => c
          })
        }
      case WidenF(_, pick) =>
        val narrow = st.gFields.filter(!_.wide)
        if (narrow.nonEmpty) {
          val f = narrow(pick % narrow.size)
          t.widenNestedColumn(gPath(st), f.name, LongType)
          st = st.copy(gFields = st.gFields.map(x =>
            if (x.id == f.id) x.copy(wide = true) else x))
        }
      case DropF(0, pick) =>
        val fs = scalars(st)
        if (fs.nonEmpty && st.sChildren.size >= 2) {
          val f = fs(pick % fs.size)
          t.dropNestedColumn("s", f.name)
          dropped += (0 -> (dropped(0) :+ f.name))
          st = st.copy(sChildren = st.sChildren.filter {
            case Sc(x) => x.id != f.id
            case _ => true
          })
        }
      case DropF(_, pick) =>
        if (st.gFields.size >= 2) {
          val f = st.gFields(pick % st.gFields.size)
          t.dropNestedColumn(gPath(st), f.name)
          dropped += (1 -> (dropped(1) :+ f.name))
          st = st.copy(gFields = st.gFields.filterNot(_.id == f.id))
        }
      case RenameG =>
        // rename the inner STRUCT itself: every descendant mapping key
        // must re-key or later reads lose the renamed leaves
        val to = s"g$gCounter"; gCounter += 1
        t.renameNestedColumn("s", st.gName, to)
        st = st.copy(gName = to)
      case DelRows(pick) =>
        val victims = rows.keySet.filter(_ % 3 == pick % 3)
        if (victims.nonEmpty) {
          t.delete(col("id") % 3 === (pick % 3).toLong)
          rows --= victims
          snap()
        }
      }
      checkNow(s"after $op")
    }

    // every recorded snapshot replays its exact historical schema and
    // contents at BOTH nesting levels — renames/widens/drops that
    // happened AFTER it must not leak back through the per-snapshot
    // mapping
    history.foreach { case (sid, s, want) =>
      val at = t.schemaAt(sid)("s").dataType.asInstanceOf[StructType]
      val wantNames = s.sChildren.map {
        case Sc(f) => f.name
        case Gr => s.gName
      }
      assert(at.fields.map(_.name).toSeq == wantNames,
        s"snapshot $sid subfield names: ${at.fields.map(_.name).toSeq} " +
          s"want $wantNames")
      val gAt = at.fields(s.sChildren.indexOf(Gr)).dataType
        .asInstanceOf[StructType]
      assert(gAt.fields.map(_.name).toSeq == s.gFields.map(_.name),
        s"snapshot $sid inner names: ${gAt.fields.map(_.name).toSeq} " +
          s"want ${s.gFields.map(_.name)}")
      check(s"snapshot $sid", t.readAt(sid).collect(), s, want)
    }
    true
  }

  test("∀ random depth-2 nested-evolution sequences in both delete " +
    "modes: reads equal the model after every op, re-added names " +
    "never resurrect at either depth, inner-struct renames re-key " +
    "descendants, and every snapshot replays its historical schema " +
    "and contents") {
    val prop = Prop.forAll(genMode, genOps)(runSequence)
    val runs = sys.props.get("graft.nested.runs").map(_.toInt).getOrElse(20)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(runs)
      .withInitialSeed(Seed(1414L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
