package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase
import graft.operators.{Chunker, ChunkingOptions}

/**
 * End-to-end port of `test_json.py::
 * test_it_chunks_elements_when_a_chunking_strategy_is_specified`: rehydrate
 * the reference's own `spring-weather.html.json` output and chunk it with the
 * basic strategy at max_characters=1500 — the reference pins exactly 9
 * CompositeElement chunks.
 */
class JsonChunkIntegrationSpec extends SparkSuiteBase {

  test("spring-weather.html.json chunks to the reference's 9 composites") {
    val sp = spark
    val text = new String(
      Files.readAllBytes(Paths.get("/root/reference/example-docs/spring-weather.html.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val els = ElementSink.partitionJson(sp, text)
    assert(els.count() > 0)
    val chunks = Chunker.chunkElements(els,
      ChunkingOptions(maxCharacters = 1500)).collect().sortBy(_.seq)
    assert(chunks.length == 9, s"got ${chunks.length} chunks")
    assert(chunks.forall(_.`type` == "CompositeElement"))
    // every chunk respects the hard max
    assert(chunks.forall(_.text.length <= 1500))
  }
}
