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
    * keys). Top-level nullability follows the field's `nullable` flag.
    * For a NESTED expand target (the container struct around it has no
    * generated name) use [[forPath]] on the expanded leaf instead. */
  def forField(f: StructField): String = {
    val defined = mutable.Set.empty[String]
    val t = walk(f.dataType, nameFor(f), defined)
    if (f.nullable) s"""["null", $t]""" else t
  }

  /** Avro schema JSON for the expanded LEAF at dotted `path` inside a root
    * field produced by a NESTED-target ExpandJson. Generated names for
    * nested targets ride the ROOT field's metadata under path-qualified
    * keys (`connect.schema.name.<rel.path>` /
    * `connect.element.schema.name.<rel.path>` — nested StructField
    * metadata does not survive Column-level struct rebuilds), so the
    * leaf's ROOT record name resolves from the qualified key while inner
    * record names come from the leaf type's own nested StructField
    * metadata (preserved intact through `withField`/`transform`, which
    * carry the parse expression's DataType wholesale). The pre-existing
    * container structs around the leaf are anonymous Spark structs with no
    * Connect name — they are deliberately NOT emitted; the Avro loop
    * closes for the expanded subtree, which is what the reference's SMT
    * names in the first place. Array levels in `path` are transparent
    * (matching ExpandJson descent); leaf nullability follows the leaf
    * StructField's flag. */
  def forPath(root: StructField, path: String): String = {
    val leaf = descend(root.dataType, path.split('.').toSeq, root.name, path)
    val qualifiedKey = leaf.dataType match {
      case _: StructType => Some(s"${JsonSchemaInference.SchemaNameKey}.$path")
      case _: ArrayType  => Some(s"${JsonSchemaInference.ElementSchemaNameKey}.$path")
      case _             => None // scalar leaf — primitives carry no name
    }
    val name = qualifiedKey.filter(root.metadata.contains).map(root.metadata.getString)
      .orElse(nameFor(leaf))
    val t = walk(leaf.dataType, name, mutable.Set.empty[String])
    if (leaf.nullable) s"""["null", $t]""" else t
  }

  /** The StructField at `parts` under `dt`, descending through structs and
    * (transparently) arrays of structs — the same descent contract as
    * ExpandJson target resolution. */
  private def descend(
      dt: DataType, parts: Seq[String], rootName: String, full: String): StructField =
    dt match {
      case st: StructType =>
        val f = st.fields.find(_.name == parts.head).getOrElse(
          throw new IllegalArgumentException(
            s"No field '${parts.head}' under '$rootName' walking path '$full' " +
              s"(have: ${st.fieldNames.mkString(", ")})"))
        if (parts.sizeIs == 1) f else descend(f.dataType, parts.tail, rootName, full)
      case ArrayType(et, _) => descend(et, parts, rootName, full)
      case other => throw new IllegalArgumentException(
        s"Cannot descend through $other at '${parts.head}' walking path '$full'")
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
            "schemaNamePrefix (or assignSchemaNames) before Avro reconstruction; " +
            "for a NESTED expand target the names ride the root field's metadata " +
            "under path-qualified keys (connect.schema.name.<rel.path>) — use " +
            "AvroSchema.forPath(rootField, path) on the expanded leaf"))
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
