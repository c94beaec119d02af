package ptx.ops
import ptx.QFn
object ScalarFns {
  def queries: Map[String, QFn] = Map()
  def oracle: Map[String, String] = Map()
}
