package graft.score

import Direction.{Down, Up}

/** Default criteria set, value-equivalent to the reference's
  * `nqs-console/src/main/resources/perceived_quality.xml:25-301`
  * (13 protocols). Expressed as a compact Scala ladder DSL: every metric in
  * the reference uses the same five quality levels with score ranges
  * (100,90) (90,80) (80,70) (70,50) (50,0) — only the value intervals,
  * weights, directions, and outlier rules differ.
  */
object PQDefaults {

  private val LadderScores = Seq((100d, 90d), (90d, 80d), (80d, 70d), (70d, 50d), (50d, 0d))

  private def ladder(intervals: String*): Seq[Band] = {
    require(intervals.size == LadderScores.size, s"need 5 bands, got ${intervals.size}")
    intervals.zip(LadderScores).map { case (iv, (u, l)) => Band.parse(u, l, iv) }
  }

  private def metric(name: String, dir: Direction, weight: Double,
      outlier: String, intervals: String*): PQMetric =
    PQMetric(name, dir, weight, OutlierRule.parseAll(outlier), ladder(intervals: _*))

  // shared band sets
  private def rttBands = Seq("(0,30]", "(30,100]", "(100,500]", "(500,2000]", "(2000,+)")
  private def lostRateBands = Seq("[0,0.01]", "(0.01,0.1]", "(0.1,0.3]", "(0.3,0.7]", "(0.7,100]")
  private def dnsCostBands = Seq("(0,40]", "(40,60]", "(60,100]", "(100,200]", "(200,+)")
  private def connCostBands = Seq("(0,60]", "(60,150]", "(150,250]", "(250,400]", "(400,+)")
  private def serverRespBands = Seq("(0,10]", "(10,100]", "(100,500]", "(500,2000]", "(2000,+)")
  private def textCostBands = Seq("(0,800]", "(800,1500]", "(1500,2500]", "(2500,5000]", "(5000,+)")
  private def webSpeedBands = Seq("[768,+)", "[512,768]", "[256,512]", "(64,256]", "(0,64]")
  private def mailSpeedBands = Seq("(1024,+)", "(300,1024]", "(50,300]", "(10,50]", "(0,10]")
  private def rateBands = Seq("(70,100]", "(30,70]", "(10,30]", "(1,10]", "(0,1]")

  private def httpMetrics = Seq(
    metric("dns_cost", Up, 0.2, "<=:0,>=:1000", dnsCostBands: _*),
    metric("conn_cost", Up, 0.2, "<=:0,>=:5000", connCostBands: _*),
    metric("text_cost", Up, 0.3, "<=:0,>=:20000", textCostBands: _*),
    metric("avg_speed", Down, 0.3, "<=:0", webSpeedBands: _*))

  private def dnsDetailMetrics(latencyField: String) = Seq(
    metric(latencyField, Up, 0.1, "<=:0,>=:1000", dnsCostBands: _*),
    metric("success_rate", Down, 0.9, "<=:0", rateBands: _*))

  val config: PQConfig = PQConfig(Seq(
    PQCriteria(1, "PING", Seq(
      metric("rtt", Up, 0.5, "<=:0,>=:5000", rttBands: _*),
      metric("lost_rate", Up, 0.5, ">=:100,<=:-1", lostRateBands: _*))),
    PQCriteria(2, "HTTP", httpMetrics),
    PQCriteria(4, "TCPPING", Seq(
      metric("rtt", Up, 0.95, "<=:0,>=:5000", rttBands: _*),
      metric("lost_rate", Up, 0.05, ">=:100,<=:-1", lostRateBands: _*))),
    PQCriteria(5, "GAME", Seq(
      metric("tcp_delay", Up, 0.4, "<=:0,>=:5000",
        "(0,50]", "(50,150]", "(150,250]", "(250,500]", "(500,+)"),
      metric("rtt", Up, 0.3, "<=:0,>=:5000", rttBands: _*),
      metric("conn_cost", Up, 0.3, "<=:0,>=:5000", connCostBands: _*))),
    PQCriteria(6, "FLASH", Seq(
      metric("conn_cost", Up, 0.15, "<=:0,>=:5000", connCostBands: _*),
      metric("first_byte_cost", Up, 0.15, "<=:0,>=:10000",
        "(0,200]", "(200,400]", "(400,600]", "(600,1000]", "(1000,+)"),
      metric("pause_count", Up, 0.25, "<=:-1,>=:10",
        "[0,1]", "(1,2]", "(2,3]", "(3,5]", "(5,+)"),
      metric("carlton_rate", Up, 0.20, "<=:-1,>=:100",
        "[0,0.1]", "(0.1,0.2]", "(0.2,0.3]", "(0.3,0.5]", "(0.5,+)"),
      metric("avg_speed", Down, 0.25, "<=:0",
        "[1024,+)", "[512,1024)", "[256,512)", "[64,256)", "(0,64)"))),
    PQCriteria(8, "DNS", Seq(
      metric("time_cost", Up, 0.1, "<=:0,>=:1000", dnsCostBands: _*),
      metric("success_rate", Down, 0.9, "<=:0", rateBands: _*))),
    PQCriteria(9, "POP3", Seq(
      metric("conn_cost", Up, 0.5, "<=:0,>=:5000", serverRespBands: _*),
      metric("avg_speed", Down, 0.5, "<=:0", mailSpeedBands: _*))),
    PQCriteria(10, "SMTP", Seq(
      metric("conn_cost", Up, 0.5, "<=:0,>=:5000", serverRespBands: _*),
      metric("send_speed", Down, 0.5, "<=:0", mailSpeedBands: _*))),
    PQCriteria(11, "WECHAT", Seq(
      metric("conn_cost", Up, 0.5, "<=:0,>=:5000", connCostBands: _*),
      metric("response_cost", Up, 0.5, "<=:0,>=:5000", serverRespBands: _*))),
    PQCriteria(12, "SPEED", Seq(
      metric("bandwidth_ratio", Down, 1.0, "<=:0",
        "(70,+)", "(30,70]", "(10,30]", "(1,10]", "(0,1]"))),
    PQCriteria(13, "FTP", Seq(
      metric("download_speed", Down, 0.5, "<=:0",
        "[6,+)", "[4,6)", "[2,4)", "[0.5,2)", "(0,0.5)"),
      metric("upload_speed", Down, 0.5, "<=:0",
        "[6,+)", "[4,6)", "[2,4)", "[0.5,2)", "(0,0.5)"))),
    PQCriteria(81, "HTTP_DETAIL", httpMetrics),
    PQCriteria(82, "DNS_DETAIL", dnsDetailMetrics("dns_cost")),
    PQCriteria(83, "DNS_RESOLUTION_DETAIL", dnsDetailMetrics("time_cost"))))
}
