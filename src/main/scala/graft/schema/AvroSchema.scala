package graft.schema

import org.apache.spark.sql.types._

import scala.collection.mutable

/**
 * Driver-side reconstruction of a NAMED Avro schema from a Spark field whose
 * metadata carries the generated Connect-style schema names
 * ([[JsonSchemaInference.assignSchemaNames]]).
 *
 * Spark `StructType`s are anonymous, so the names an Avro / Schema-Registry
 * sink needs (SURVEY.md §1.3; reference schema-name generator,
 * ExpandJson.java:233-245) ride as field metadata
 * (`connect.schema.name` / `connect.element.schema.name`). This closes the
 * loop: metadata → Avro record names, honoring the reference counter
 * semantics (`prefix`, `prefix2`, ... — no "1" suffix) and the structural
 * sharing they encode — the SECOND occurrence of a named record is emitted
 * as a name reference, exactly how Avro expresses one definition used twice.
 *
 * Offline by design: no Avro library, no registry — the schema is the plain
 * Avro JSON text (records/arrays/primitives, nullable fields as
 * `["null", T]` unions per the reference's all-nullable contract,
 * ExpandJson.java:36). A production deployment posts this string to its
 * registry; nothing here touches the network.
 */
object AvroSchema {

  /** Avro schema JSON for a field produced by ExpandJson with a
    * `schemaNamePrefix` (or any field whose metadata carries the naming
    * keys). Top-level nullability follows the field's `nullable` flag. */
  def forField(f: StructField): String = {
    val defined = mutable.Set.empty[String]
    val t = walk(f.dataType, nameFor(f), defined)
    if (f.nullable) s"""["null", $t]""" else t
  }

  /** The name the enclosing field's metadata assigns to its (struct or
    * array-element-struct) type, if any. */
  private def nameFor(f: StructField): Option[String] = {
    val key = f.dataType match {
      case _: StructType => JsonSchemaInference.SchemaNameKey
      case _: ArrayType  => JsonSchemaInference.ElementSchemaNameKey
      case _             => return None
    }
    if (f.metadata.contains(key)) Some(f.metadata.getString(key)) else None
  }

  private def walk(dt: DataType, name: Option[String], defined: mutable.Set[String]): String =
    dt match {
      case st: StructType =>
        val n = name.getOrElse(throw new IllegalArgumentException(
          "Struct carries no generated schema name — run ExpandJson with a " +
            "schemaNamePrefix (or assignSchemaNames) before Avro reconstruction"))
        if (defined.contains(n)) quote(n) // structural sharing → name reference
        else {
          defined += n
          val fields = st.fields.map { f =>
            val t = walk(f.dataType, nameFor(f), defined)
            val typ = if (f.nullable) s"""["null", $t]""" else t
            s"""{"name": ${quote(f.name)}, "type": $typ}"""
          }
          s"""{"type": "record", "name": ${quote(n)}, "fields": [${fields.mkString(", ")}]}"""
        }
      case ArrayType(et, containsNull) =>
        val items = walk(et, name, defined)
        val itemT = if (containsNull) s"""["null", $items]""" else items
        s"""{"type": "array", "items": $itemT}"""
      case StringType  => quote("string")
      case IntegerType => quote("int")
      case LongType    => quote("long")
      case DoubleType  => quote("double")
      case FloatType   => quote("float")
      case BooleanType => quote("boolean")
      case BinaryType  => quote("bytes")
      case other => throw new IllegalArgumentException(
        s"No Avro mapping for $other — the KIP-301 inference ladder never produces it")
    }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
