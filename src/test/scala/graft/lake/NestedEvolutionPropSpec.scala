package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Model-based properties for NESTED schema evolution (round 13,
  * SURVEY D46): random ADD/RENAME/WIDEN/DROP sequences on a struct
  * column, interleaved with appends and row deletes, run in parallel
  * against a GraftTable and an in-memory model. After EVERY op the
  * table's read() must equal the model (a re-added subfield name must
  * read NULL on pre-drop rows, never resurrected bytes); after the
  * sequence, `schemaAt`/`readAt` of each recorded snapshot must replay
  * that snapshot's exact historical schema AND contents — each
  * snapshot's recorded logical→physical mapping resolves renamed
  * leaves no matter how the names moved afterwards. Both delete modes
  * face the same workloads: COW rewrites must spell physical subfield
  * names correctly when rewriting evolved structs.
  */
class NestedEvolutionPropSpec extends SparkSuite {

  private sealed trait Op
  private case class Ins(n: Int) extends Op
  private case class AddF(reuseDropped: Boolean) extends Op
  private case class RenameF(pick: Int) extends Op
  private case class WidenF(pick: Int) extends Op
  private case class DropF(pick: Int) extends Op
  private case class DelRows(pick: Int) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> Gen.choose(1, 3).map(Ins),
    2 -> Gen.oneOf(true, false).map(AddF),
    2 -> Gen.choose(0, 7).map(RenameF),
    1 -> Gen.choose(0, 7).map(WidenF),
    2 -> Gen.choose(0, 7).map(DropF),
    1 -> Gen.choose(0, 2).map(DelRows))

  private val genOps: Gen[List[Op]] =
    Gen.choose(5, 10).flatMap(n => Gen.listOfN(n, genOp))

  private val genMode: Gen[String] =
    Gen.oneOf("merge-on-read", "copy-on-write")

  /** One logical subfield: stable identity (values key), current
    * logical name, INT vs widened-to-BIGINT. */
  private case class F(id: Int, name: String, wide: Boolean)

  private def runSequence(mode: String, ops: List[Op]): Boolean = {
    val wh = graft.ScratchDirs.create("graft-nested-prop-")
    val cat = new GraftCatalog(spark, wh)
    cat.createNamespace("default")
    val t = cat.createTable("default", "nested_t",
      StructType.fromDDL("id BIGINT, s STRUCT<f0: INT, f1: INT>"),
      Map("write.delete.mode" -> mode))
    var fields = Vector(F(0, "f0", wide = false), F(1, "f1", wide = false))
    var nextFieldId = 2
    var nameCounter = 2
    var droppedNames = Vector.empty[String]
    // rowId -> (fieldIdentity -> value); a field absent at insert time
    // has no entry and must read NULL forever (and after re-adds)
    var rows = Map.empty[Long, Map[Int, Long]]
    var nextRow = 0L
    // snapshotId -> the (fields, rows) the snapshot must replay
    var history =
      Vector.empty[(Long, Vector[F], Map[Long, Map[Int, Long]])]

    def structType(fs: Vector[F]): StructType = StructType(fs.map(f =>
      StructField(f.name, if (f.wide) LongType else IntegerType)))
    def curSchema = StructType(Seq(StructField("id", LongType),
      StructField("s", structType(fields))))

    def cell(f: F, v: Long): Any =
      if (f.wide) java.lang.Long.valueOf(v)
      else java.lang.Integer.valueOf(v.toInt)

    def freshName(reuseDropped: Boolean): String =
      if (reuseDropped && droppedNames.nonEmpty) {
        // the resurrect-guard case: a re-added name must NOT rebind to
        // dropped bytes; eligible only while no live field has it
        droppedNames.find(n => !fields.exists(_.name == n)).getOrElse {
          val n = s"f$nameCounter"; nameCounter += 1; n
        }
      } else { val n = s"f$nameCounter"; nameCounter += 1; n }

    def check(label: String, got: Array[Row], fs: Vector[F],
        want: Map[Long, Map[Int, Long]]): Unit = {
      assert(got.length == want.size,
        s"$label: ${got.length} rows, model has ${want.size}")
      got.foreach { r =>
        val id = r.getLong(0)
        val vals = want.getOrElse(id,
          throw new AssertionError(s"$label: unexpected row $id"))
        val st = r.getStruct(1)
        fs.zipWithIndex.foreach { case (f, j) =>
          vals.get(f.id) match {
            case Some(v) =>
              val g = if (f.wide) st.getLong(j) else st.getInt(j).toLong
              assert(g == v, s"$label: row $id field ${f.name} " +
                s"(identity ${f.id}) read $g, want $v")
            case None => assert(st.isNullAt(j),
              s"$label: row $id field ${f.name} (identity ${f.id}) " +
                s"must be NULL (added after the row, or re-added), " +
                s"got ${st.get(j)}")
          }
        }
      }
    }

    def checkNow(label: String): Unit =
      check(label, t.read().collect(), fields, rows)

    def snap(): Unit = t.currentSnapshot.foreach { s =>
      history :+= ((s.snapshotId, fields, rows))
    }

    ops.foreach { op =>
      op match {
      case Ins(n) =>
        val rws = (0 until n).map { _ =>
          val id = nextRow; nextRow += 1
          val vals = fields.map(f => f.id -> (id * 100 + f.id)).toMap
          rows += (id -> vals)
          Row(id, Row(fields.map(f => cell(f, vals(f.id))): _*))
        }
        t.append(spark.createDataFrame(rws.asJava, curSchema))
        snap()
      case AddF(reuse) =>
        val name = freshName(reuse)
        t.addNestedColumn("s", StructField(name, IntegerType))
        fields :+= F(nextFieldId, name, wide = false)
        nextFieldId += 1
      case RenameF(pick) =>
        val f = fields(pick % fields.size)
        val to = freshName(reuseDropped = false)
        t.renameNestedColumn("s", f.name, to)
        fields = fields.map(x => if (x.id == f.id) x.copy(name = to) else x)
      case WidenF(pick) =>
        val narrow = fields.filter(!_.wide)
        if (narrow.nonEmpty) {
          val f = narrow(pick % narrow.size)
          t.widenNestedColumn("s", f.name, LongType)
          fields = fields.map(x =>
            if (x.id == f.id) x.copy(wide = true) else x)
        }
      case DropF(pick) =>
        if (fields.size >= 2) {
          val f = fields(pick % fields.size)
          t.dropNestedColumn("s", f.name)
          droppedNames :+= f.name
          fields = fields.filterNot(_.id == f.id)
        }
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
    // contents — renames/widens/drops that happened AFTER it must not
    // leak back through the per-snapshot mapping
    history.foreach { case (sid, fs, want) =>
      val at = t.schemaAt(sid)("s").dataType.asInstanceOf[StructType]
      assert(at.fields.map(_.name).toSeq == fs.map(_.name),
        s"snapshot $sid subfield names: ${at.fields.map(_.name).toSeq} " +
          s"want ${fs.map(_.name)}")
      assert(at.fields.map(_.dataType).toSeq ==
        fs.map(f => if (f.wide) LongType else IntegerType),
        s"snapshot $sid subfield types drifted")
      check(s"snapshot $sid", t.readAt(sid).collect(), fs, want)
    }
    true
  }

  test("∀ random nested-evolution sequences in both delete modes: " +
    "reads equal the model after every op, re-added names never " +
    "resurrect, and every snapshot replays its historical schema " +
    "and contents") {
    val prop = Prop.forAll(genMode, genOps)(runSequence)
    val runs = sys.props.get("graft.nested.runs").map(_.toInt).getOrElse(20)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(runs)
      .withInitialSeed(Seed(1313L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
