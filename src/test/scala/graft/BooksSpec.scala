package graft

import graft.ops.BooksOps
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden transform test (SURVEY.md §5.2.1): the reference pipeline's
  * observable semantics on a fixture reproducing every ragged-input edge
  * case from FIXTURES.md §A.1 (missing image, dropped subtitle, multi /
  * empty authors, absent + unparseable rating, float-formatted string id,
  * bare non-wrapped record). */
class BooksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val out: Map[Long, Row] = {
    val path = getClass.getResource("/books/raw_books.jsonl").getPath
    val flat = BooksOps.flattenRawBooks(
      BooksOps.parseRawJsonLines(spark.read.text(path)))
    assert(flat.columns.toSeq ==
      Seq("id", "title", "image", "genres", "rating", "author_id", "author_name"),
      "P2 whitelist: exactly the 7 reference columns, subtitle dropped")
    flat.collect().map(r => r.getAs[Long]("id") -> r).toMap
  }

  private def arr(r: Row, c: String): Seq[String] =
    r.getSeq[String](r.fieldIndex(c)).toList

  test("plain wrapped record flattens fully (P1-P7)") {
    val r = out(1L)
    assert(r.getAs[String]("title") == "Plain Book")
    assert(r.getAs[String]("image") == "http://img/1.jpg")
    assert(arr(r, "genres") == Seq("fiction"))
    assert(r.getAs[Double]("rating") == 0.8 * 100.0)
    assert(arr(r, "author_id") == Seq("11") && arr(r, "author_name") == Seq("Ann Author"))
  }

  test("missing image passes through as null (transform.py:33)") {
    assert(out(2L).isNullAt(out(2L).fieldIndex("image")))
  }

  test("multi-author arrays stay parallel and source-ordered (P4/P6)") {
    val r = out(4L)
    assert(arr(r, "author_id") == Seq("41", "42"))
    assert(arr(r, "author_name") == Seq("Dee First", "Ed Second"))
    assert(arr(r, "genres") == Seq("sci-fi", "fantasy"))
  }

  test("empty authors yield empty arrays, not null (the `or []` guard)") {
    val r = out(5L)
    assert(arr(r, "author_id") == Seq.empty && arr(r, "author_name") == Seq.empty)
  }

  test("absent rating.average coerces to null (P3 null-guard)") {
    assert(out(6L).isNullAt(out(6L).fieldIndex("rating")))
  }

  test("unparseable rating coerces to null, not an error (P7 coerce)") {
    assert(out(9L).isNullAt(out(9L).fieldIndex("rating")))
  }

  test("float-formatted string id goes through the int(float(x)) chain (P5)") {
    assert(out.contains(27339838L))
    assert(out(27339838L).getAs[String]("title") == "Stringy Id Book")
  }

  test("bare non-wrapped record is ingested (the isinstance branch, P1)") {
    assert(out(8L).getAs[String]("title") == "Bare Record Book")
  }

  test("all 9 fixture records survive the flatten (E1 tolerance)") {
    assert(out.size == 9)
  }
}
