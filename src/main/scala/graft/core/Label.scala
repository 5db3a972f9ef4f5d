package graft.core

/** Node types of the metamodel grammar.
  *
  * Mirrors the reference's typed-label system (architxt/tree.py:56-94):
  * labels are either plain strings or `TYPE::name` where TYPE is one of
  * ENT / GROUP / REL / COLL.
  */
sealed abstract class NodeType(val value: String) extends Serializable
object NodeType {
  case object Ent extends NodeType("ENT")
  case object Group extends NodeType("GROUP")
  case object Rel extends NodeType("REL")
  case object Coll extends NodeType("COLL")

  val all: Seq[NodeType] = Seq(Ent, Group, Rel, Coll)
  private val byValue: Map[String, NodeType] = all.map(t => t.value -> t).toMap
  def fromString(s: String): Option[NodeType] = byValue.get(s)
}

/** A node label: `Typed(ENT, "person")` renders as `"ENT::person"`;
  * anything else is `Plain`. Round-trips the reference's string form
  * (architxt/tree.py:63-94).
  */
sealed trait Label extends Serializable {
  /** The display / serialization form. */
  def render: String
  /** The `name` part: for Typed it's the name, for Plain the raw label. */
  def name: String
  def nodeType: Option[NodeType]
  def isTyped: Boolean = nodeType.isDefined
  def hasType(t: NodeType): Boolean = nodeType.contains(t)
  override def toString: String = render
}

final case class Typed(tpe: NodeType, labelName: String) extends Label {
  def render: String = if (labelName.isEmpty) tpe.value else s"${tpe.value}::$labelName"
  def name: String = labelName
  def nodeType: Option[NodeType] = Some(tpe)
}

final case class Plain(labelName: String) extends Label {
  def render: String = labelName
  def name: String = labelName
  def nodeType: Option[NodeType] = None
}

object Label {
  /** Parse `"TYPE::name"` into Typed, `"TYPE"` alone into Typed with empty
    * name, anything else into Plain — same contract as
    * NodeLabel.fromstring (architxt/tree.py:63-94).
    */
  def parse(s: String): Label = {
    val idx = s.indexOf("::")
    if (idx >= 0) {
      NodeType.fromString(s.substring(0, idx)) match {
        case Some(t) => Typed(t, s.substring(idx + 2))
        case None    => Plain(s)
      }
    } else {
      NodeType.fromString(s) match {
        case Some(t) => Typed(t, "")
        case None    => Plain(s)
      }
    }
  }
}
