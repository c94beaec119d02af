package ptx.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Guarded session-registry registration for the engine's SQL kernels
  * (gram_hashes, cosine_sim, sorted_intersect_count).
  *
  * The old pattern — `createOrReplaceTempFunction` on every operator call —
  * silently mutated session state: a user-defined function of the same name
  * was clobbered as a side effect of a library call (ADVICE r10). The guard
  * resolves the name FIRST:
  *   - absent → register the kernel builder once;
  *   - present and already ours (the builder yields the kernel's Expression
  *     class — true both for a prior temp registration and for a session
  *     built with [[ptx.PtxExtensions]]) → no-op;
  *   - present but bound to something else → fail LOUDLY. Skipping would
  *     clobber the user's function; proceeding would silently evaluate the
  *     user's function inside our operators and return wrong results. A
  *     name conflict has no safe automatic resolution, so it surfaces as an
  *     error telling the user to rename or use PtxExtensions.
  */
private[ptx] object Registration {
  def ensure(spark: SparkSession, name: String, arity: Int,
             builder: Seq[Expression] => Expression,
             extraProbes: Seq[Seq[Expression]] = Nil): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    reg.lookupFunctionBuilder(id) match {
      case None =>
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      case Some(existing) =>
        // probe the registered builder with null literals (plus any
        // caller-supplied extra shapes — e.g. gram_hashes' 2-arg form) and
        // compare the CONSTRUCTED expressions structurally: class equality
        // alone would accept a foreign wrapper that builds the same class
        // with different bindings (a different default width, a dropped
        // argument — ADVICE r11). semanticEquals compares the canonicalized
        // trees, so every constructor binding must match ours. Builders
        // are pure constructors here — no evaluation happens.
        val probes = Seq.fill(arity)(Literal(null): Expression) +: extraProbes
        val ours = probes.forall { probeArgs =>
          scala.util.Try(existing(probeArgs)).toOption.exists {
            e => builder(probeArgs).semanticEquals(e)
          }
        }
        if (!ours) throw new IllegalStateException(
          s"function '$name' is already bound to a different implementation " +
            "in this session; ptx operators require the ptx kernel of the " +
            "same name. Rename the conflicting function or build the " +
            "session with ptx.PtxExtensions.")
    }
  }
}
