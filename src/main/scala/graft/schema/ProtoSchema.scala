package graft.schema

/** Minimal protobuf schema model + .proto text parser.
  *
  * The reference compiles protobuf descriptors to columns (reference:
  * transformer/protobuf/ProtobufTransformer.java:64-273). protobuf-java is
  * not on this classpath, so the descriptor model and the text parser are
  * implemented directly; the subset covers the reference's tested surface:
  * messages (nested), enums, oneof, repeated, map<k,v>, proto3 optional,
  * field options (for confluent.field_meta decimal params), and the
  * well-known types the reference special-cases.
  */
object ProtoSchema {

  sealed trait PType
  final case class PScalar(name: String) extends PType
  final case class PNamed(name: String) extends PType // message or enum ref
  final case class PMap(keyType: PScalar, valueType: PType) extends PType

  final case class PField(name: String, number: Int, tpe: PType,
                          repeated: Boolean, optional: Boolean,
                          oneofName: Option[String],
                          options: Map[String, String])

  final case class PMessage(name: String, fqName: String, fields: Seq[PField],
                            oneofs: Seq[String])
  final case class PEnum(name: String, fqName: String, values: Seq[(String, Int)])

  final case class ProtoFile(pkg: String, messages: Map[String, PMessage],
                             enums: Map[String, PEnum],
                             topLevelOrder: Seq[String] = Nil) {
    def resolveMessage(name: String): Option[PMessage] =
      messages.get(name).orElse(messages.values.find(_.name == name.split('.').last)
        .filter(_ => messages.values.count(_.name == name.split('.').last) == 1))
    def resolveEnum(name: String): Option[PEnum] =
      enums.get(name).orElse(enums.values.find(_.name == name.split('.').last)
        .filter(_ => enums.values.count(_.name == name.split('.').last) == 1))
    /** First top-level message IN DECLARATION ORDER (default when no ;msg:
      * given, like the reference's first-message-in-file default). */
    def firstMessage: PMessage =
      topLevelOrder.headOption.flatMap(messages.get)
        .getOrElse(messages.values.minBy(_.fqName.count(_ == '.')))
  }

  val scalarTypes = Set(
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
    "string", "bytes")

  // ---- parser ----------------------------------------------------------

  def parse(text: String): ProtoFile = {
    val src = stripComments(text)
    val tokens = tokenize(src)
    val p = new Parser(tokens)
    p.parseFile()
  }

  private def stripComments(s: String): String =
    s.replaceAll("//[^\n]*", "").replaceAll("(?s)/\\*.*?\\*/", "")

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val end = s.indexOf(c, i + 1)
        out += s.substring(i, end + 1); i = end + 1
      } else if ("{}=;<>,[]()".contains(c)) { out += c.toString; i += 1 }
      else {
        var j = i
        while (j < s.length && !s(j).isWhitespace && !"{}=;<>,[]()\"'".contains(s(j))) j += 1
        out += s.substring(i, j); i = j
      }
    }
    out.result()
  }

  private class Parser(tokens: Vector[String]) {
    private var pos = 0
    private def peek: String = if (pos < tokens.length) tokens(pos) else ""
    private def next(): String = { val t = peek; pos += 1; t }
    private def expect(t: String): Unit = {
      val got = next(); require(got == t, s"expected '$t' got '$got'")
    }

    private val messages = scala.collection.mutable.Map[String, PMessage]()
    private val enums = scala.collection.mutable.Map[String, PEnum]()
    private val topLevel = Seq.newBuilder[String]
    private var pkg = ""

    def parseFile(): ProtoFile = {
      while (pos < tokens.length) {
        peek match {
          case "syntax" | "edition" => skipStatement()
          case "package" => next(); pkg = next(); expect(";")
          case "import" | "option" => skipStatement()
          case "message" =>
            val fq = parseMessage(pkg)
            topLevel += fq
          case "enum" => parseEnum(pkg)
          case "" => pos += 1
          case _ => skipStatement()
        }
      }
      ProtoFile(pkg, messages.toMap, enums.toMap, topLevel.result())
    }

    private def skipStatement(): Unit = {
      while (pos < tokens.length && peek != ";" && peek != "{") next()
      if (peek == "{") skipBlock() else if (peek == ";") next()
    }

    private def skipBlock(): Unit = {
      expect("{"); var depth = 1
      while (depth > 0 && pos < tokens.length) {
        next() match { case "{" => depth += 1; case "}" => depth -= 1; case _ => }
      }
    }

    private def parseEnum(scope: String): Unit = {
      expect("enum")
      val name = next()
      val fq = if (scope.isEmpty) name else s"$scope.$name"
      expect("{")
      val values = Seq.newBuilder[(String, Int)]
      while (peek != "}") {
        peek match {
          case "option" | "reserved" => skipStatement()
          case _ =>
            val vname = next(); expect("=")
            val vnum = next().toInt
            if (peek == "[") skipBrackets()
            expect(";")
            values += (vname -> vnum)
        }
      }
      expect("}")
      enums(fq) = PEnum(name, fq, values.result())
    }

    private def skipBrackets(): Unit = {
      expect("["); var depth = 1
      while (depth > 0 && pos < tokens.length) {
        next() match { case "[" => depth += 1; case "]" => depth -= 1; case _ => }
      }
    }

    /** Capture bracket option text for field_meta param extraction. */
    private def captureBrackets(): String = {
      expect("[")
      val sb = new StringBuilder; var depth = 1
      while (depth > 0 && pos < tokens.length) {
        val t = next()
        t match { case "[" => depth += 1; case "]" => depth -= 1; case _ => }
        if (depth > 0) sb.append(t).append(' ')
      }
      sb.toString()
    }

    private def parseMessage(scope: String): String = {
      expect("message")
      val name = next()
      val fq = if (scope.isEmpty) name else s"$scope.$name"
      expect("{")
      val fields = Seq.newBuilder[PField]
      val oneofs = Seq.newBuilder[String]
      while (peek != "}") {
        peek match {
          case "message" => parseMessage(fq)
          case "enum" => parseEnum(fq)
          case "option" | "reserved" | "extensions" => skipStatement()
          case "oneof" =>
            next(); val oname = next(); oneofs += oname
            expect("{")
            while (peek != "}") fields += parseField(oneof = Some(oname))
            expect("}")
          case _ => fields += parseField(oneof = None)
        }
      }
      expect("}")
      messages(fq) = PMessage(name, fq, fields.result(), oneofs.result())
      fq
    }

    private def parseField(oneof: Option[String]): PField = {
      var repeated = false; var optional = false
      var t = next()
      while (t == "repeated" || t == "optional" || t == "required") {
        if (t == "repeated") repeated = true
        if (t == "optional") optional = true
        t = next()
      }
      val tpe: PType =
        if (t == "map") {
          expect("<"); val k = next(); expect(","); val v = next(); expect(">")
          PMap(PScalar(k), if (scalarTypes(v)) PScalar(v) else PNamed(v))
        } else if (scalarTypes(t)) PScalar(t)
        else PNamed(t)
      val fname = next()
      expect("=")
      val num = next().toInt
      val opts =
        if (peek == "[") parseFieldMeta(captureBrackets()) else Map.empty[String, String]
      expect(";")
      PField(fname, num, tpe, repeated, optional, oneof, opts)
    }

    /** Extract key/value params from option text like
      * (confluent.field_meta)={params:[{key:"precision",value:"5"},...]}. */
    private def parseFieldMeta(raw: String): Map[String, String] = {
      val kv = """key\s*:\s*"([^"]+)"\s*,?\s*value\s*:\s*"([^"]+)"""".r
      kv.findAllMatchIn(raw).map(m => m.group(1) -> m.group(2)).toMap
    }
  }
}
