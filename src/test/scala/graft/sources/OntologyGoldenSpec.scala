package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden port of `documents/test_ontology_to_unstructured_parsing.py::
 * test_ingest` widened to every html/json fixture pair the reference ships:
 * parse the annotated HTML with the v2 ontology partitioner and compare
 * against the reference's own serialized element output. The comparison is
 * (category, text) per element — exactly what the reference's
 * `Text.__eq__` compares (`elements.py:888-896`); the goldens' embedded
 * `category_depth`/`parent_id` predate the ML-1328 heading-level semantics
 * that the reference's (and this port's) current behavior implements.
 */
class OntologyGoldenSpec extends AnyFunSuite {

  private val dir = "/root/reference/test_unstructured/documents"

  private val pairs = Seq("example", "example_full_doc",
    "example_with_alternative_text", "example_with_inline_fields", "three_tables")

  private def unq(x: String): String = {
    val body = x.stripPrefix("\"").stripSuffix("\"")
    // JSON unescape for the text payloads (quotes, unicode escapes)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' if i + 6 <= body.length =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def expected(name: String): Seq[(String, String)] = {
    val json = new String(
      Files.readAllBytes(Paths.get(s"$dir/unstructured_json_output/$name.json")), "UTF-8")
    graft.sinks.RawJsonBridge.split(json).map { o =>
      val t = graft.sinks.RawJsonBridge.tokens(o)
      (unq(t.getOrElse("type", "")), unq(t.getOrElse("text", "")))
    }
  }

  pairs.foreach { name =>
    test(s"$name.html parses to the reference's serialized (type, text) stream") {
      val html = new String(
        Files.readAllBytes(Paths.get(s"$dir/html_files/$name.html")), "UTF-8")
      val ours = HtmlOntology.partition(html).map(e => (e.elementType, e.text))
      assert(ours == expected(name))
    }
  }
}
