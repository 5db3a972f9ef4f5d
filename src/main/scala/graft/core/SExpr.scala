package graft.core

import scala.util.matching.Regex

/** Bracket / S-expression codec for trees.
  *
  * Semantics follow the reference parser/printer
  * (architxt/tree.py:1128-1275): tokens are percent-quoted (Python
  * urllib.parse.quote with safe='/'), trees print as
  * `(LABEL child ...)`, typed labels as `TYPE::name`.
  */
object SExpr {

  // Same tokenizer as the reference (tree.py:53):
  //   open-paren+label | lone paren | bare token
  private val TokenRe: Regex = """\(\s*[^\s()]+|[()]|[^\s()]+""".r

  /** Percent-encode like Python's urllib.parse.quote(s, safe='/'). */
  def quote(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      val safe = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-' || c == '~' || c == '/'
      if (safe) sb.append(c) else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Decode %XX sequences (UTF-8), like urllib.parse.unquote. */
  def unquote(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = new scala.collection.mutable.ArrayBuffer[Byte]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes += Integer.parseInt(s.substring(i + 1, i + 3), 16).toByte
        i += 3
      } else { bytes ++= c.toString.getBytes("UTF-8"); i += 1 }
    }
    new String(bytes.toArray, "UTF-8")
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  final case class ParseException(msg: String) extends RuntimeException(msg)

  /** Parse a LISP-style bracket string into a tree (tree.py:1128-1183). */
  def parse(text: String): ArchiTree = {
    // stack of (label, children-so-far); sentinel frame at the bottom
    var stack = List[(Option[String], Vector[Child])]((None, Vector.empty))

    for (m <- TokenRe.findAllMatchIn(text)) {
      val token = m.matched
      if (token.startsWith("(") && token.length > 1) {
        if (stack.length == 1 && stack.head._2.nonEmpty)
          throw ParseException(s"expected end-of-string but got '$token' at ${m.start}")
        val label = unquote(token.drop(1).dropWhile(_.isWhitespace))
        stack = (Some(label), Vector.empty) :: stack
      } else if (token == ")") {
        if (stack.length == 1)
          throw ParseException(s"unbalanced ')' at ${m.start}")
        val (label, children) = stack.head
        stack = stack.tail
        val node = ArchiTree(Label.parse(label.get), children)
        stack = (stack.head._1, stack.head._2 :+ Child.Node(node)) :: stack.tail
      } else if (token == "(") {
        // A lone '(' opens a node with an empty label — the reference parser
        // (and NLTK) accepts '((A b))' as Tree('', [Tree('A', ['b'])]).
        if (stack.length == 1 && stack.head._2.nonEmpty)
          throw ParseException(s"expected end-of-string but got '$token' at ${m.start}")
        stack = (Some(""), Vector.empty) :: stack
      } else {
        if (stack.length == 1)
          throw ParseException(s"expected '(' but got '$token' at ${m.start}")
        stack = (stack.head._1, stack.head._2 :+ Child.Leaf(unquote(token))) :: stack.tail
      }
    }

    if (stack.length > 1) throw ParseException("expected ')' but got end-of-string")
    stack.head._2 match {
      case Vector(Child.Node(t)) => t
      case Vector()              => throw ParseException("empty input")
      case _                     => throw ParseException("expected a single tree")
    }
  }

  /** Single-line bracket form, leaves percent-quoted (tree.py:1254-1275). */
  def format(t: ArchiTree): String = {
    val sb = new StringBuilder
    def go(n: ArchiTree): Unit = {
      sb.append('(').append(n.label.render)
      n.children.foreach {
        case Child.Leaf(v) => sb.append(' ').append(quote(v))
        case Child.Node(c) => sb.append(' '); go(c)
      }
      sb.append(')')
    }
    go(t)
    sb.toString
  }
}
