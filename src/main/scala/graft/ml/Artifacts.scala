package graft.ml

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Model/artifact sinks and loads (SURVEY.md K3/S9: the reference pickles
  * forecaster state and reloads params JSON, `optimization.py:199-204`,
  * `evaluation.ipynb#5-7`). Driver-side JSON via the Jackson bundled with
  * Spark: pickle is Python-private, JSON is the portable equivalent; MLlib
  * models use their own native `save`/`load`.
  */
object Artifacts {

  private val mapper = new ObjectMapper()

  private def arr(node: ObjectNode, name: String, v: Array[Double]): Unit = {
    val a = node.putArray(name)
    v.foreach(a.add)
  }

  private def darr(node: com.fasterxml.jackson.databind.JsonNode, name: String): Array[Double] = {
    val n = node.get(name)
    (0 until n.size()).map(i => n.get(i).asDouble()).toArray
  }

  /** Persist a fitted ARIMAX model (coefficients + forecast state). */
  def saveArimax(model: ArimaxModel, path: String): Unit = {
    val root = mapper.createObjectNode()
    root.put("p", model.p); root.put("d", model.d); root.put("q", model.q)
    root.put("intercept", model.intercept)
    arr(root, "phi", model.phi); arr(root, "theta", model.theta)
    arr(root, "beta", model.beta)
    arr(root, "lastDiffs", model.lastDiffs)
    arr(root, "lastResiduals", model.lastResiduals)
    arr(root, "diffState", model.diffState)
    Files.writeString(Paths.get(path), mapper.writeValueAsString(root))
  }

  def loadArimax(path: String): ArimaxModel = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    ArimaxModel(n.get("p").asInt(), n.get("d").asInt(), n.get("q").asInt(),
      darr(n, "phi"), darr(n, "theta"), darr(n, "beta"),
      n.get("intercept").asDouble(),
      darr(n, "lastDiffs"), darr(n, "lastResiduals"), darr(n, "diffState"))
  }

  /** Persist a BO search result (best params + history), the engine's
    * analog of the reference's searched-params pickle.
    */
  def saveBoResult(res: Bo.BoResult, path: String): Unit = {
    val root = mapper.createObjectNode()
    val best = root.putObject("best")
    res.best.foreach { case (k, v) => best.put(k, v) }
    root.put("bestMean", res.bestMean)
    root.put("bestStd", res.bestStd)
    val hist = root.putArray("history")
    res.history.foreach { case (params, mean, std) =>
      val h = hist.addObject()
      val p = h.putObject("params")
      params.foreach { case (k, v) => p.put(k, v) }
      h.put("mean", mean); h.put("std", std)
    }
    Files.writeString(Paths.get(path), mapper.writeValueAsString(root))
  }

  def loadBoResult(path: String): Bo.BoResult = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    def params(node: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] = {
      val it = node.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
      b.result()
    }
    val hist = n.get("history")
    Bo.BoResult(params(n.get("best")), n.get("bestMean").asDouble(),
      n.get("bestStd").asDouble(),
      (0 until hist.size()).map { i =>
        val h = hist.get(i)
        (params(h.get("params")), h.get("mean").asDouble(), h.get("std").asDouble())
      })
  }
}
