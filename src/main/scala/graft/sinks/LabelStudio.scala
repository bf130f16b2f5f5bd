package graft.sinks

import graft.model.Element

/**
 * LabelStudio task staging — `staging/label_studio.py:1-147`: typed
 * annotation/prediction records with the reference's validation rules
 * (label-type whitelist, 0..1 score range, element/annotation length match)
 * and its sparse `to_dict` rendering (None-valued top-level fields dropped,
 * `id` inside a result kept even when None).
 *
 * Task construction is per-element and order-aligned like the reference's —
 * a driver-side prep step for upload batches; the plain Dataset path
 * ([[Staging.stageForLabelStudio]]) stays the scale route when no
 * annotations ride along.
 */
object LabelStudio {

  /** `VALID_LABEL_TYPES` (`label_studio.py:11-33`). */
  val ValidLabelTypes: Seq[String] = Seq(
    "labels", "hypertextlabels", "paragraphlabels", "rectangle", "keypoint",
    "polygon", "brush", "ellipse", "rectanglelabels", "keypointlabels",
    "polygonlabels", "brushlabels", "ellipselabels", "timeserieslabels",
    "choices", "number", "taxonomy", "textarea", "rating", "pairwise",
    "videorectangle")

  /** `LabelStudioResult` (`label_studio.py:36-57`). */
  final case class Result(
      `type`: String,
      value: Map[String, Any],
      fromName: String,
      toName: String,
      id: Option[String] = None,
      hidden: Boolean = false,
      readOnly: Boolean = false) {
    require(ValidLabelTypes.contains(`type`),
      s"${`type`} is not a valid label type. Valid label types are: $ValidLabelTypes")

    def toDict: Map[String, Any] = Map(
      "type" -> `type`, "value" -> value, "from_name" -> fromName,
      "to_name" -> toName, "id" -> id.orNull, "hidden" -> hidden,
      "read_only" -> readOnly)
  }

  /** `LabelStudioReview` (`label_studio.py:60-71`). */
  final case class Review(
      createdBy: Map[String, Any],
      accepted: Boolean,
      id: Option[String] = None) {
    def toDict: Map[String, Any] =
      Map("created_by" -> createdBy, "accepted" -> accepted, "id" -> id.orNull)
  }

  /** `LabelStudioAnnotation` (`label_studio.py:74-98`): None-valued optional
    * fields are DROPPED from the rendered dict. */
  sealed trait AnnotationLike {
    def result: Seq[Result]
    def id: Option[String]
    def leadTime: Option[Double]
    def completedBy: Option[Int]
    def reviews: Option[Seq[Review]]
    def wasCanceled: Boolean

    protected def baseDict: Map[String, Any] = {
      val opt = Seq(
        "id" -> id, "lead_time" -> leadTime, "completed_by" -> completedBy,
        "reviews" -> reviews.map(_.map(_.toDict)))
        .collect { case (k, Some(v)) => k -> (v: Any) }
      Map("result" -> result.map(_.toDict), "was_canceled" -> wasCanceled) ++ opt
    }
  }

  final case class Annotation(
      result: Seq[Result],
      id: Option[String] = None,
      leadTime: Option[Double] = None,
      completedBy: Option[Int] = None,
      reviews: Option[Seq[Review]] = None,
      wasCanceled: Boolean = false) extends AnnotationLike {
    def toDict: Map[String, Any] = baseDict
  }

  /** `LabelStudioPrediction` (`label_studio.py:101-110`): score must be 0..1. */
  final case class Prediction(
      result: Seq[Result],
      score: Double,
      id: Option[String] = None,
      leadTime: Option[Double] = None,
      completedBy: Option[Int] = None,
      reviews: Option[Seq[Review]] = None,
      wasCanceled: Boolean = false) extends AnnotationLike {
    require(score >= 0 && score <= 1,
      s"$score is not a valid score value. Score value must be a number between 0 and 1.")
    def toDict: Map[String, Any] = baseDict + ("score" -> score)
  }

  /**
   * `stage_for_label_studio` (`label_studio.py:113-147`): one task per
   * element — `data.<textField>` + `data.<idField>`, with order-aligned
   * annotation/prediction lists; a length mismatch is an error.
   */
  def tasks(elements: Seq[Element],
      annotations: Option[Seq[Seq[Annotation]]] = None,
      predictions: Option[Seq[Seq[Prediction]]] = None,
      textField: String = "text",
      idField: String = "ref_id"): Seq[Map[String, Any]] = {
    annotations.foreach(a => require(a.length == elements.length,
      "The length of elements and annotations must match."))
    predictions.foreach(p => require(p.length == elements.length,
      "The length of elements and predictions must match."))
    elements.zipWithIndex.map { case (e, i) =>
      val data = Map(textField -> e.text) ++
        Option(e.element_id).filter(_.nonEmpty).map(idField -> _)
      Map("data" -> data) ++
        annotations.map(a => "annotations" -> a(i).map(_.toDict)) ++
        predictions.map(p => "predictions" -> p(i).map(_.toDict))
    }
  }
}
