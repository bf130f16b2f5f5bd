package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata}
import graft.operators.MetadataOps
import graft.sinks.LabelStudio._

/**
 * Behavior port of `test_unstructured/staging/test_label_studio.py` — the
 * typed annotation/prediction record layer and its validation rules.
 */
class LabelStudioSpec extends AnyFunSuite {

  private def bear: Seq[Element] = MetadataOps.assignHashIds(Seq(
    Element("", "NarrativeText", "A big brown bear", "d", 1, ElementMetadata())))

  private val choices = Result(
    `type` = "choices", value = Map("choices" -> Seq("Positive")),
    fromName = "sentiment", toName = "text")

  test("convert_to_label_studio_data: data carries text + ref_id (hash id)") {
    val data = tasks(bear).head("data").asInstanceOf[Map[String, Any]]
    assert(data("text") == "A big brown bear")
    assert(data("ref_id") == "2812a3676591a479c5425789f9c0156f")
  }

  test("text and id field names are caller-configurable") {
    val data = tasks(bear, textField = "random_text", idField = "custom_id")
      .head("data").asInstanceOf[Map[String, Any]]
    assert(data.contains("random_text") && data.contains("custom_id"))
  }

  test("created annotation renders sparsely: None optionals dropped, result id kept") {
    val d = Annotation(result = Seq(choices)).toDict
    assert(d == Map(
      "result" -> Seq(Map(
        "type" -> "choices", "value" -> Map("choices" -> Seq("Positive")),
        "from_name" -> "sentiment", "to_name" -> "text",
        "id" -> null, "hidden" -> false, "read_only" -> false)),
      "was_canceled" -> false))
  }

  test("prediction score must be in 0..1") {
    Seq(0.0, 0.5, 1.0).foreach { s =>
      assert(Prediction(result = Seq(choices), score = s).score == s)
    }
    Seq(-0.25, 1.25).foreach { s =>
      intercept[IllegalArgumentException] {
        Prediction(result = Seq(choices), score = s)
      }
    }
  }

  test("stage with annotation produces the reference task shape") {
    val t = tasks(bear, annotations = Some(Seq(Seq(Annotation(Seq(choices)))))).head
    assert(t("data") == Map("text" -> "A big brown bear",
      "ref_id" -> "2812a3676591a479c5425789f9c0156f"))
    val anns = t("annotations").asInstanceOf[Seq[Map[String, Any]]]
    assert(anns.head("was_canceled") == false)
    assert(anns.head("result").asInstanceOf[Seq[Map[String, Any]]]
      .head("from_name") == "sentiment")
  }

  test("stage with prediction carries the score") {
    val t = tasks(bear,
      predictions = Some(Seq(Seq(Prediction(Seq(choices), score = 0.98))))).head
    val preds = t("predictions").asInstanceOf[Seq[Map[String, Any]]]
    assert(preds.head("score") == 0.98)
  }

  test("NER annotation values pass through untouched") {
    val ner = Result(`type` = "labels",
      value = Map("start" -> 12, "end" -> 16, "text" -> "bear", "labels" -> Seq("PER")),
      fromName = "label", toName = "text")
    val t = tasks(bear, annotations = Some(Seq(Seq(Annotation(Seq(ner)))))).head
    val r = t("annotations").asInstanceOf[Seq[Map[String, Any]]]
      .head("result").asInstanceOf[Seq[Map[String, Any]]].head
    assert(r("value") == Map("start" -> 12, "end" -> 16, "text" -> "bear",
      "labels" -> Seq("PER")))
  }

  test("mismatched annotation/prediction lengths raise") {
    intercept[IllegalArgumentException] {
      tasks(bear, annotations = Some(Seq.empty))
    }
    intercept[IllegalArgumentException] {
      tasks(bear, predictions = Some(Seq.empty))
    }
  }

  test("invalid label type raises") {
    intercept[IllegalArgumentException] {
      Result(`type` = "bears", value = Map("bears" -> Seq("Positive")),
        fromName = "sentiment", toName = "text")
    }
  }

  test("reviewed annotation renders reviews when present") {
    val ann = Annotation(Seq(choices),
      reviews = Some(Seq(Review(createdBy = Map("user_id" -> 1), accepted = true))))
    val d = ann.toDict
    assert(d("reviews") == Seq(Map("created_by" -> Map("user_id" -> 1),
      "accepted" -> true, "id" -> null)))
  }
}
