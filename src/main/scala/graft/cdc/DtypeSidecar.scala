package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.json4s.{JObject, JString}
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Loader for the reference's CDC schema sidecar: the CSV→SQL step exports a
 * pandas dtype map per table as `<table>_schema.json`
 * (`csv_to_sql.py:40-44`, e.g. `{"id": "int64", "price": "float64",
 * "name": "object"}`), and the CDC merger rebuilds its Debezium row schema
 * from it (`cdc_merger_optimized.py:26-75`). This is the Spark-side
 * equivalent: sidecar file → [[StructType]] via the same dtype mapping
 * ([[graft.functions.Coerce.dtypeToSpark]]), preserving field order.
 */
object DtypeSidecar {

  def load(path: Path): StructType = {
    val txt = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    JsonMethods.parse(txt) match {
      case JObject(fields) =>
        StructType(fields.map {
          case (name, JString(dtype)) =>
            StructField(name, graft.functions.Coerce.dtypeToSpark(dtype))
          case (name, other) =>
            throw new IllegalArgumentException(
              s"sidecar $path: field '$name' has non-string dtype $other")
        })
      case other =>
        throw new IllegalArgumentException(
          s"sidecar $path: expected a JSON object of column -> dtype, got $other")
    }
  }
}
