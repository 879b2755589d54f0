package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** General two-stream stateful correlation — the faithful emulation of the
  * reference's CoProcessFunction (`rlink/src/core/function.rs:255-272`,
  * dispatch `runtime/worker/runnable/co_process_runnable.rs:90-105`):
  * a tagged union of both sides, keyed, processed per key against
  * operator-local state. The reference dispatches the left stream to
  * `process_left` and others to `process_right(seq)`; here the user
  * function receives `Either[L, R]` per element with exactly that meaning.
  *
  * Scale: the tagged union shuffles once on the key; state lives in the
  * StateStore (spillable, checkpointed) rather than the reference's
  * in-heap BTreeMap.
  *
  * The dominant production use (config/dimension enrichment) should use
  * `api.DataStream.connect` (broadcast join) instead — this generic path
  * is for genuinely stateful cross-stream logic.
  *
  * Ordering: WITHIN one micro-batch, the iterator's left/right interleaving
  * is not defined (Spark shuffles both sides together and presents one
  * unordered group per key) — unlike the reference, which dispatches
  * elements in single-threaded arrival order. User functions must not
  * assume "configs before facts" inside a batch; cross-BATCH ordering IS
  * guaranteed (state written in batch N is visible in batch N+1), which is
  * what the streaming test relies on. Order-sensitive logic should carry an
  * event-time field and sort/fold the group explicitly.
  */
object CoProcess {

  final case class Tagged[K, L, R](key: K, seq: Int, left: Option[L], right: Option[R])

  def connect[K, L, R, S, O](left: Dataset[L], right: Dataset[R])(
      keyL: L => K, keyR: R => K)(
      fn: (K, Iterator[Either[L, R]], GroupState[S]) => Iterator[O])(
      implicit ek: Encoder[K], et: Encoder[Tagged[K, L, R]],
      es: Encoder[S], eo: Encoder[O]): Dataset[O] = {
    val taggedLeft  = left.map(l => Tagged[K, L, R](keyL(l), 0, Some(l), None))
    val taggedRight = right.map(r => Tagged[K, L, R](keyR(r), 1, None, Some(r)))
    taggedLeft.union(taggedRight)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: K, it: Iterator[Tagged[K, L, R]], state: GroupState[S]) =>
          fn(k,
            it.map(t => if (t.seq == 0) Left(t.left.get) else Right(t.right.get)),
            state))
  }
}
