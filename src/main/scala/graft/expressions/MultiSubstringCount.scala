package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-substring counter (SURVEY.md §2.4 A15, §7.4 — "the one
  * genuinely valuable custom Catalyst piece").
  *
  * The reference counts 190 function words per chapter with 190 separate
  * `text.count(word)` scans (红楼梦作者分析.py:117-128) — O(words × textLen).
  * This expression builds an Aho-Corasick automaton ONCE per executor
  * (transient lazy) and counts every pattern in a single O(textLen) pass,
  * returning an array<long> aligned with the pattern list.
  *
  * Matches are counted at every occurrence (including overlaps), which for
  * non-self-overlapping patterns equals Python's `str.count` non-overlapping
  * semantics — pinned in the spec.
  */
case class MultiSubstringCountExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression
    with CodegenFallback {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_substring_count requires string, got ${other.catalogString}")
    }

  /** Aho-Corasick automaton over chars; built lazily once per deserialized
    * expression instance (i.e., once per executor task-set, not per row).
    */
  @transient private lazy val automaton = MultiSubstringCountExpr.Automaton(patterns)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(automaton.countAll(text))
  }

  override def prettyName: String = "multi_substring_count"
  override protected def withNewChildInternal(newChild: Expression): MultiSubstringCountExpr =
    copy(child = newChild)
}

object MultiSubstringCountExpr {

  /** Classic Aho-Corasick: goto/fail/output links over a char-keyed trie. */
  final case class Automaton(patterns: Seq[String]) {
    private val root = new Node
    // build trie
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var node = root
      p.foreach { ch => node = node.children.getOrElseUpdate(ch, new Node) }
      node.outputs ::= idx
    }
    // BFS fail links
    locally {
      val queue = scala.collection.mutable.Queue.empty[Node]
      root.children.valuesIterator.foreach { c => c.fail = root; queue.enqueue(c) }
      while (queue.nonEmpty) {
        val node = queue.dequeue()
        node.children.foreach { case (ch, child) =>
          var f = node.fail
          while (f != null && !f.children.contains(ch)) f = f.fail
          child.fail = if (f == null) root else f.children(ch)
          child.outputs = child.outputs ::: child.fail.outputs
          queue.enqueue(child)
        }
      }
    }

    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var node = root
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != root && !node.children.contains(ch)) node = node.fail
        node = node.children.getOrElse(ch, root)
        var outs = node.outputs
        while (outs.nonEmpty) {
          counts(outs.head) += 1
          outs = outs.tail
        }
        i += 1
      }
      counts
    }
  }

  private final class Node {
    val children = scala.collection.mutable.HashMap.empty[Char, Node]
    var fail: Node = _
    var outputs: List[Int] = Nil
  }

  /** Column API: counts of each pattern in `text`, as array<long> aligned
    * with `patterns`.
    */
  def multiSubstringCount(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MultiSubstringCountExpr(ColumnBridge.expression(text), patterns))
  }
}
