package graft.gie

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Gremlin *text* front-end for the GIE plane: parses a traversal
  * string into the [[Traversal]] algebra, so a user can submit
  * `g.V().has('oid', 'system').out('1..3')` instead of calling the
  * Scala DSL. Mirrors the reference's compiler entry point
  * (`interactive_engine/compiler/.../LogicalPlanOptimizer.java:56` —
  * antlr Gremlin → IR; `research/query_service/ir/core/src/plan/
  * logical.rs`), restated as a hand-rolled recursive-descent parser
  * over the step subset the algebra implements. The GIE dialect's
  * range expansion `out('1..3')` (PathExpand) is supported.
  *
  * Supported steps: `V()`, `has('oid', <lit>)`,
  * `has('oid', TextP.startingWith(p) | eq(x) | neq(x) | within(a,b))`,
  * `out() | in() | both()`, `out('l..u') | in('l..u') | both('l..u')`
  * (PathExpand + endV, base-expand direction from the step name),
  * `out('l..u').path()` / `out('l..u').simplePath().path()` (PathExpand
  * result_opt ALL_V: materialized walks with a `path_str` column),
  * `outE()`, `values('oid')`, `dedup()`, `as('t')`, `select('t')`,
  * `where(<sub>)`, `not(<sub>)`, `union(<sub>, …)`,
  * `repeat(<sub>).times(n)`,
  * `groupCount().by('oid')`, `order().by(col, asc|desc)…`,
  * `limit(n)`, `count()`, `endV()`, `hops()` (GIE Auxilia on the
  * PathExpand hop column). String literals take single or double
  * quotes; anonymous sub-traversals may start with `__.`.
  */
object Gremlin {

  // ---- AST ----
  private sealed trait Arg
  private case class Lit(s: String) extends Arg
  private case class Num(n: Long) extends Arg
  private case class Pred(fn: String, args: Seq[String]) extends Arg
  private case class Sub(steps: List[Step]) extends Arg
  private case class Sym(s: String) extends Arg // asc / desc / bare word
  private case class Step(name: String, args: List[Arg])

  // ---- tokenizer / recursive descent ----
  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def eof: Boolean = { ws(); i >= s.length }
    def peek: Char = { ws(); if (i >= s.length) fail("unexpected end of input"); s(i) }
    def eat(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def tryEat(c: Char): Boolean = {
      ws()
      if (i < s.length && s(i) == c) { i += 1; true } else false
    }
    def ident(): String = {
      ws()
      val j = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == j) fail("expected identifier")
      s.substring(j, i)
    }
    def stringLit(): String = {
      ws()
      if (i >= s.length) fail("expected string literal")
      val q = s(i)
      if (q != '\'' && q != '"') fail("expected string literal")
      i += 1
      val j = i
      while (i < s.length && s(i) != q) i += 1
      if (i >= s.length) fail("unterminated string")
      val out = s.substring(j, i)
      i += 1
      out
    }
    def numLit(): Long = {
      ws()
      val j = i
      while (i < s.length && s(i).isDigit) i += 1
      if (i == j) fail("expected number")
      s.substring(j, i).toLong
    }
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"gremlin parse error at ${i}: $msg in: $s")

    /** `g.V()....` or an anonymous `__.out()...` / `out()...` chain. */
    def chain(anonymous: Boolean): List[Step] = {
      ws()
      if (!anonymous) {
        if (ident() != "g") fail("traversal must start with g")
        eat('.')
      } else if (s.startsWith("__", i)) { i += 2; eat('.') }
      var steps = List.newBuilder[Step]
      var first = true
      while (!eof && (first || tryEat('.'))) {
        first = false
        val name = ident()
        eat('(')
        val args = List.newBuilder[Arg]
        if (peek != ')') {
          args += arg()
          while (tryEat(',')) args += arg()
        }
        eat(')')
        steps += Step(name, args.result())
        ws()
        if (i < s.length && s(i) != '.') {
          if (!anonymous && i < s.length) fail(s"trailing input")
        }
      }
      steps.result()
    }

    private def arg(): Arg = {
      ws()
      val c = peek
      if (c == '\'' || c == '"') Lit(stringLit())
      else if (c.isDigit) Num(numLit())
      else {
        // identifier: predicate fn, TextP.xxx, bare symbol, or sub-traversal
        val save = i
        var id = ident()
        ws()
        if (id == "TextP" || id == "P") { eat('.'); id = ident(); ws() }
        if (i < s.length && s(i) == '(') {
          if (id == "eq" || id == "neq" || id == "within" || id == "startingWith") {
            eat('(')
            val vs = List.newBuilder[String]
            vs += stringLit()
            while (tryEat(',')) vs += stringLit()
            eat(')')
            Pred(id, vs.result())
          } else { i = save; Sub(chain(anonymous = true)) }
        } else if (id == "__") { i = save; Sub(chain(anonymous = true)) }
        else Sym(id)
      }
    }
  }

  private val RangeLit = """(\d+)\.\.(\d+)""".r

  /** Parse + lower a Gremlin traversal string over graph `g`. Returns
    * the result frame (terminal `values`/`groupCount`/`count`/… or the
    * traverser frame's columns as-is).
    */
  def run(g: LinkGraph, text: String): DataFrame = {
    val steps = new P(text).chain(anonymous = false)
    eval(G.V(g), steps, sourceDone = false) match {
      case Left(t) => t.df
      case Right(df) => df
    }
  }

  private def predCol(field: String, p: Arg): Column = p match {
    case Lit(v) => col(field) === v
    case Pred("eq", Seq(v)) => col(field) === v
    case Pred("neq", Seq(v)) => col(field) =!= v
    case Pred("within", vs) => col(field).isin(vs: _*)
    case Pred("startingWith", Seq(v)) => col(field).startsWith(v)
    case other => throw new IllegalArgumentException(s"unsupported has predicate: $other")
  }

  /** Evaluate a step list. State is Left(traversal) while vertex-typed,
    * Right(frame) after a terminal aggregate (order/limit still apply).
    */
  private def eval(
      start: Traversal, steps: List[Step], sourceDone: Boolean
  ): Either[Traversal, DataFrame] = {
    var st: Either[Traversal, DataFrame] = Left(start)
    def t: Traversal = st.swap.getOrElse(throw new IllegalArgumentException(
      "vertex step after terminal aggregate"))
    def d: DataFrame = st.getOrElse(throw new IllegalArgumentException(
      "frame step before terminal aggregate"))
    var rest = if (sourceDone) steps else steps match {
      case Step("V", Nil) :: tl => tl
      case _ => throw new IllegalArgumentException("traversal must start with g.V()")
    }
    while (rest.nonEmpty) {
      val Step(name, args) = rest.head
      rest = rest.tail
      (name, args) match {
        case ("has", List(Lit(f), p)) => st = Left(t.has(predCol(f, p)))
        case ("has", List(Lit(f))) => st = Left(t.has(col(f).isNotNull))
        case ("out", Nil) => st = Left(t.out())
        case ("in", Nil) => st = Left(t.in())
        case ("both", Nil) => st = Left(t.both())
        case ("outE", Nil) => st = Left(t.outE())
        case (dir @ ("out" | "in" | "both"), List(Lit(RangeLit(lo, hi)))) =>
          // GIE path_opt: an immediately following simplePath() selects
          // SIMPLE walks; a following path() selects result_opt ALL_V
          // (materialized walks via pathExpandPaths + sink-side oid
          // decode) instead of the dedup-fused endV form. The step name
          // is the base EdgeExpand direction.
          val simple = rest.headOption.exists(s => s.name == "simplePath" && s.args.isEmpty)
          if (simple) rest = rest.tail
          rest match {
            case Step("path", Nil) :: tl =>
              st = Left(t.pathExpandPaths(lo.toInt, hi.toInt, simple, dir).pathOids())
              rest = tl
            case _ if simple =>
              throw new IllegalArgumentException("simplePath() requires a following path()")
            case _ =>
              st = Left(t.pathExpand(lo.toInt, hi.toInt, dir))
          }
        case ("endV", Nil) => st = Left(t) // GetV after range expand — already vertex-positioned
        case ("dedup", Nil) => st = Left(t.dedup())
        case ("as", List(Lit(tag))) => st = Left(t.as_(tag))
        case ("select", List(Lit(tag))) => st = Left(t.back(tag))
        case ("where", List(Sub(sub))) =>
          st = Left(t.whereExists(o => eval(o, sub, sourceDone = true) match {
            case Left(res) => res
            case Right(_) => throw new IllegalArgumentException("where() sub-traversal must stay vertex-typed")
          }))
        case ("not", List(Sub(sub))) =>
          st = Left(t.whereNotExists(o => eval(o, sub, sourceDone = true) match {
            case Left(res) => res
            case Right(_) => throw new IllegalArgumentException("not() sub-traversal must stay vertex-typed")
          }))
        case ("union", subs) if subs.nonEmpty && subs.forall(_.isInstanceOf[Sub]) =>
          val branches = subs.map { case Sub(sub) =>
            (o: Traversal) => eval(o, sub, sourceDone = true) match {
              case Left(res) => res
              case Right(_) => throw new IllegalArgumentException(
                "union() branches must stay vertex-typed")
            }
          }
          st = Left(t.union(branches: _*))
        case ("repeat", List(Sub(sub))) => rest match {
          case Step("times", List(Num(n))) :: tl =>
            var cur = t
            (1L to n).foreach { _ =>
              cur = eval(cur, sub, sourceDone = true) match {
                case Left(res) => res
                case Right(_) => throw new IllegalArgumentException("repeat() body must stay vertex-typed")
              }
            }
            st = Left(cur); rest = tl
          case _ => throw new IllegalArgumentException("repeat() must be followed by times(n)")
        }
        case ("values", List(Lit(f))) =>
          st = Right((if (f == "oid") t.auxilia() else t).values(f))
        case ("hops", Nil) =>
          st = Right(t.auxilia().df.select(col("oid"), col("__hops").as("hops")))
        case ("groupCount", Nil) => rest match {
          case Step("by", List(Lit(f))) :: tl =>
            st = Right((if (f == "oid") t.auxilia() else t).groupCount(f)); rest = tl
          case _ => st = Right(t.groupCount("__v"))
        }
        case ("count", Nil) =>
          val base = st match { case Left(tr) => tr.df; case Right(df) => df }
          st = Right(base.agg(count(lit(1)).as("n")))
        case ("order", Nil) =>
          val cols = List.newBuilder[Column]
          var more = true
          while (more) rest match {
            case Step("by", List(Lit(f))) :: tl => cols += col(f).asc; rest = tl
            case Step("by", List(Lit(f), Sym("asc"))) :: tl => cols += col(f).asc; rest = tl
            case Step("by", List(Lit(f), Sym("desc"))) :: tl => cols += col(f).desc; rest = tl
            case _ => more = false
          }
          st = st match {
            case Left(tr) => Left(tr.ordered(cols.result(): _*))
            case Right(df) => Right(df.orderBy(cols.result(): _*))
          }
        case ("limit", List(Num(n))) =>
          st = st match {
            case Left(tr) => Left(tr.limit(n.toInt))
            case Right(df) => Right(df.limit(n.toInt))
          }
        case other =>
          throw new IllegalArgumentException(s"unsupported gremlin step: $other")
      }
    }
    st
  }
}
