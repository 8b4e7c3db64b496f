package graft.score

import scala.xml.{Elem, Node, XML}

/** Loader for reference-format criteria XML
  * (`nqs-console/src/main/resources/perceived_quality.xml`; parser semantics
  * from `CONSOLE/score/ParserPQXml.java:18-70`). Lets a reference user drop
  * their existing scoring config straight into this engine. Parsed once on
  * the driver; the model is then compiled to Catalyst expressions — the
  * config never ships to executors.
  */
object PQXml {

  def loadFile(path: String): PQConfig = fromElem(XML.loadFile(path))

  def loadString(xml: String): PQConfig = fromElem(XML.loadString(xml))

  def fromElem(root: Elem): PQConfig = {
    val criteria = (root \\ "criteria").map(parseCriteria)
    PQConfig(criteria.toSeq)
  }

  private def parseCriteria(n: Node): PQCriteria =
    PQCriteria(
      id = (n \@ "id").toLong,
      protocol = n \@ "protocol",
      metrics = (n \ "metric").map(parseMetric).toSeq)

  private def parseMetric(n: Node): PQMetric = {
    val dir = if ((n \@ "direction") == "down") Direction.Down else Direction.Up
    PQMetric(
      name = (n \@ "name").trim,
      direction = dir,
      weight = (n \@ "weight").toDouble,
      outliers = OutlierRule.parseAll(n \@ "outlier"),
      bands = (n \ "score").map { s =>
        Band.parse((s \@ "upper").toDouble, (s \@ "lower").toDouble, s.text.trim)
      }.toSeq)
  }
}
