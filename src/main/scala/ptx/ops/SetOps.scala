package ptx.ops
import ptx.QFn
object SetOps {
  def queries: Map[String, QFn] = Map()
  def oracle: Map[String, String] = Map()
}
