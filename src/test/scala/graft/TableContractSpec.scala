package graft

import org.scalatest.funsuite.AnyFunSuite

/** Load-contract tripwire for the driver-provided tables.
  *
  * Round 7 lost 34 queries to a silent testdata regeneration that
  * changed `events.ts`'s parquet logical type. [[TsEncodingSpec]] pins
  * that specific drift; this spec pins the REST of the contract — the
  * column names and the post-normalization Spark types every operator
  * in the engine assumes. If the driver regenerates the data with a
  * different shape, the failure surfaces here as one named assertion,
  * not as dozens of dead queries.
  *
  * Deliberately permissive where operators are: integer widths may
  * widen (int32 → int64 is absorbed by Spark's arithmetic), so only
  * the type FAMILY is pinned for keys; value/text columns pin exact
  * families too (floating, string, array<float>).
  */
class TableContractSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  private def families(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.schema.fields.map { f =>
      val fam = f.dataType.typeName match {
        case "integer" | "long" | "short" | "byte" => "int"
        case "float" | "double" => "float"
        case t if t.startsWith("decimal") => "float"
        case "array" => "array<" + f.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType.typeName + ">"
        case other => other
      }
      f.name -> fam
    }.toMap

  private def check(name: String, df: org.apache.spark.sql.DataFrame,
                    expected: (String, String)*): Unit = {
    val got = families(df)
    expected.foreach { case (c, fam) =>
      assert(got.contains(c), s"$name: missing column $c (have ${got.keys.mkString(", ")})")
      assert(got(c) == fam, s"$name.$c: expected type family $fam, got ${got(c)}")
    }
  }

  test("every table loads with the column names and type families the operators assume") {
    check("region", Tables.region(spark, sf), "r_regionkey" -> "int", "r_name" -> "string")
    check("nation", Tables.nation(spark, sf),
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int")
    check("customer", Tables.customer(spark, sf),
      "c_custkey" -> "int", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "float", "c_mktsegment" -> "string")
    check("supplier", Tables.supplier(spark, sf),
      "s_suppkey" -> "int", "s_name" -> "string", "s_nationkey" -> "int", "s_acctbal" -> "float")
    check("part", Tables.part(spark, sf),
      "p_partkey" -> "int", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "float")
    check("orders", Tables.orders(spark, sf),
      "o_orderkey" -> "int", "o_custkey" -> "int", "o_orderstatus" -> "string",
      "o_totalprice" -> "float", "o_orderpriority" -> "string")
    check("lineitem", Tables.lineitem(spark, sf),
      "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
      "l_linenumber" -> "int", "l_quantity" -> "float", "l_extendedprice" -> "float",
      "l_discount" -> "float", "l_tax" -> "float",
      "l_returnflag" -> "string", "l_linestatus" -> "string")
    // events: post-normalization contract — ts is epoch-nanos LONG
    check("events", Tables.events(spark, sf),
      "event_id" -> "int", "ts" -> "int", "user_id" -> "int",
      "event_type" -> "string", "value" -> "float", "props" -> "string")
    check("documents", Tables.documents(spark, sf),
      "doc_id" -> "int", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "int")
    check("embeddings", Tables.embeddings(spark, sf),
      "vec_id" -> "int", "embedding" -> "array<float>", "label" -> "int")
  }

  test("date-typed columns are date-castable (the shape the TPC-H queries consume)") {
    import org.apache.spark.sql.functions.col
    val o = Tables.orders(spark, sf).select(col("o_orderdate").cast("date")).limit(1).collect()
    val l = Tables.lineitem(spark, sf).select(col("l_shipdate").cast("date")).limit(1).collect()
    assert(o.nonEmpty && l.nonEmpty)
  }
}
