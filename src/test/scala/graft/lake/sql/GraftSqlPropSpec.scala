package graft.lake.sql

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Model-based property test for the SQL surface: random DML
  * sequences — INSERT / DELETE / UPDATE / MERGE / mode flips / CALL
  * maintenance — are applied THROUGH spark.sql only and checked
  * against an in-memory model after every statement. The SQL twin of
  * GraftTablePropSpec: together they pin that both entry surfaces
  * drive the same engine semantics across COW/MOR mode combinations.
  */
class GraftSqlPropSpec extends SparkSuite {

  private case class M(caseId: String, firstName: Option[String])

  private sealed trait Op
  private case class Insert(n: Int) extends Op
  private case class Delete(pick: Int) extends Op
  private case class Nullify(pick: Int) extends Op
  private case class MergeUpsert(pick: Int, n: Int) extends Op
  private case class FlipMode(prop: String, mor: Boolean) extends Op
  private case object CallRewrite extends Op
  private case object CallRewriteDeletes extends Op
  private case class Overwrite(pick: Int) extends Op
  private case object UnsetDeleteMode extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> Gen.choose(1, 4).map(Insert),
    2 -> Gen.choose(0, 7).map(Delete),
    2 -> Gen.choose(0, 7).map(Nullify),
    2 -> Gen.zip(Gen.choose(0, 7), Gen.choose(1, 3))
      .map { case (p, n) => MergeUpsert(p, n) },
    1 -> Gen.zip(
      Gen.oneOf("write.delete.mode", "write.update.mode",
        "write.merge.mode"),
      Gen.oneOf(true, false)).map { case (p, m) => FlipMode(p, m) },
    1 -> Gen.const(CallRewrite),
    1 -> Gen.const(CallRewriteDeletes),
    1 -> Gen.choose(0, 7).map(Overwrite),
    1 -> Gen.const(UnsetDeleteMode))

  private val genOps: Gen[List[Op]] =
    Gen.choose(4, 8).flatMap(n => Gen.listOfN(n, genOp))

  private val genModes: Gen[(String, String)] = for {
    del <- Gen.oneOf("merge-on-read", "copy-on-write")
    mrg <- Gen.oneOf("merge-on-read", "copy-on-write")
  } yield (del, mrg)

  private var seq = 0

  private def runSequence(modes: (String, String),
      ops: List[Op]): Boolean = {
    seq += 1
    val ns = s"prop_$seq${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.t"
    spark.sql(s"CREATE TABLE $tbl (case_id STRING, first_name STRING) " +
      s"USING graft TBLPROPERTIES (" +
      s"'write.delete.mode'='${modes._1}', " +
      s"'write.merge.mode'='${modes._2}')")
    var model = Vector.empty[M]
    var nextId = 0

    def freshIds(n: Int): Seq[String] =
      (0 until n).map { _ => val id = f"case-$nextId%04d"; nextId += 1; id }

    def targets(pick: Int): Seq[String] = {
      val ids = model.map(_.caseId).distinct.sorted
      ids.zipWithIndex.collect {
        case (id, i) if i % 3 == pick % 3 => id
      }
    }

    def inList(ids: Seq[String]): String =
      ids.map(id => s"'$id'").mkString("(", ",", ")")

    def check(op: Op): Unit = {
      val got = spark.sql(s"SELECT case_id, first_name FROM $tbl")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
        .toSet
      val want = model.map(m => (m.caseId, m.firstName)).toSet
      assert(got == want, s"SQL table diverged from model after $op " +
        s"(ops=$ops modes=$modes)\n got=$got\nwant=$want")
    }

    ops.foreach { op =>
      op match {
        case Insert(n) =>
          val ids = freshIds(n)
          val values = ids.map(id => s"('$id', 'name-$id')").mkString(", ")
          spark.sql(s"INSERT INTO $tbl VALUES $values")
          model ++= ids.map(id => M(id, Some(s"name-$id")))
        case Delete(pick) =>
          val ids = targets(pick)
          if (ids.nonEmpty) {
            spark.sql(
              s"DELETE FROM $tbl WHERE case_id IN ${inList(ids)}")
            model = model.filterNot(m => ids.contains(m.caseId))
          }
        case Nullify(pick) =>
          val ids = targets(pick)
          if (ids.nonEmpty) {
            spark.sql(s"UPDATE $tbl SET first_name = NULL " +
              s"WHERE case_id IN ${inList(ids)}")
            model = model.map(m =>
              if (ids.contains(m.caseId)) m.copy(firstName = None) else m)
          }
        case MergeUpsert(pick, n) =>
          val existing = targets(pick)
          val fresh = freshIds(n)
          val srcIds = existing ++ fresh
          val values = srcIds.map(id => s"('$id', 'merged-$id')")
            .mkString(", ")
          spark.sql(
            s"""MERGE INTO $tbl t
               |USING (SELECT * FROM VALUES $values
               |  AS s(case_id, first_name)) s
               |ON t.case_id = s.case_id
               |WHEN MATCHED THEN UPDATE SET t.first_name = s.first_name
               |WHEN NOT MATCHED THEN INSERT (case_id, first_name)
               |  VALUES (s.case_id, s.first_name)""".stripMargin)
          model = model.map(m =>
            if (existing.contains(m.caseId))
              m.copy(firstName = Some(s"merged-${m.caseId}"))
            else m) ++ fresh.map(id => M(id, Some(s"merged-$id")))
        case FlipMode(prop, mor) =>
          val v = if (mor) "merge-on-read" else "copy-on-write"
          spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('$prop'='$v')")
        case CallRewrite =>
          spark.sql("CALL graft.system.rewrite_data_files(" +
            s"table => '$ns.t', rewrite_all => true, " +
            "target_file_size_bytes => 134217728)").collect()
        case CallRewriteDeletes =>
          spark.sql("CALL graft.system.rewrite_position_delete_files(" +
            s"table => '$ns.t')").collect()
        case Overwrite(pick) =>
          // atomic truncate-and-refill with a surviving slice
          val keep = targets(pick)
          spark.sql(s"INSERT OVERWRITE $tbl SELECT case_id, first_name " +
            s"FROM $tbl" + (if (keep.isEmpty) " WHERE 1 = 0"
              else s" WHERE case_id IN ${inList(keep)}"))
          model = model.filter(m => keep.contains(m.caseId))
        case UnsetDeleteMode =>
          // falls back to default copy-on-write; semantics unchanged
          spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES " +
            "('write.delete.mode')")
      }
      check(op)
    }
    true
  }

  test("∀ random SQL DML sequences x write modes: SELECT == model " +
    "after every statement (SQL twin of GraftTablePropSpec)") {
    val prop = Prop.forAll(genModes, genOps)(runSequence)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(5)
      .withInitialSeed(Seed(1337L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
