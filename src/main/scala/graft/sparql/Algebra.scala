package graft.sparql

/** SPARQL 1.1 algebra AST (SURVEY §2.B).
  *
  * This is the intermediate form between the text parser
  * ([[SparqlParser]]) and the DataFrame compiler ([[Compiler]]):
  * `SPARQL text → algebra → rewrite → DataFrame → Catalyst`.
  * Mirrors the W3C algebra (BGP / Join / LeftJoin / Union / Minus /
  * Filter / Extend / Group / Project / Distinct / OrderBy / Slice),
  * the shape GraphDB evaluates behind the reference's
  * `prepareTupleQuery` entry point (`GraphDBSystemAdapter.java:246`).
  */
object Algebra {

  // ---- nodes in triple patterns --------------------------------------

  /** Name prefix of anonymous (non-distinguished) variables minted by
    * the parser for blank nodes in query patterns — `[ … ]` property
    * lists, `( … )` collections and `_:label`s (SPARQL 1.1 §4.1.4:
    * bnodes in queries act as variables). `@` cannot appear in a
    * source-level VAR token, so user variables can never collide;
    * `SELECT *` and `DESCRIBE` skip these names.
    */
  val AnonVarPrefix = "@"
  def isAnonVar(v: String): Boolean = v.startsWith(AnonVarPrefix)

  sealed trait Node
  /** query variable */
  final case class V(name: String) extends Node
  /** concrete term: kind 0=IRI 1=bnode 2=literal */
  final case class T(lex: String, kind: Int = 0, dt: String = "", lang: String = "")
      extends Node
  object T {
    def lit(s: String): T = T(s, 2, "xsd:string")
    def num(d: Double): T = {
      val bd = BigDecimal(d).setScale(6)
      T(bd.bigDecimal.toPlainString, 2, "xsd:decimal")
    }
    /** from source text: integer-shaped lexicals keep xsd:integer AND
      * an integral canonical lexical ("30", not "30.000000") — term-
      * identity joins against Turtle-parsed data depend on the two
      * front-ends canonicalizing identically
      */
    def num(text: String): T = {
      val isInt = !text.contains('.') && !text.toLowerCase.contains('e')
      val bd = BigDecimal(text)
        .setScale(if (isInt) 0 else 6, BigDecimal.RoundingMode.HALF_UP)
      T(bd.bigDecimal.toPlainString, 2, if (isInt) "xsd:integer" else "xsd:decimal")
    }
  }

  // ---- property paths -------------------------------------------------

  sealed trait Path
  final case class PLink(iri: String) extends Path
  final case class PVar(name: String) extends Path
  final case class PInv(p: Path) extends Path
  final case class PSeq(l: Path, r: Path) extends Path
  final case class PAlt(l: Path, r: Path) extends Path
  final case class PStar(p: Path) extends Path
  final case class PPlus(p: Path) extends Path
  final case class POpt(p: Path) extends Path
  /** negated property set `!(p1|p2)` */
  final case class PNeg(iris: Seq[String]) extends Path

  final case class TriplePat(s: Node, p: Path, o: Node)

  // ---- expressions ----------------------------------------------------

  sealed trait Expr
  final case class EVar(name: String) extends Expr
  final case class EConst(t: T) extends Expr
  /** builtin/operator call; op is lower-case ("&&", "=", "regex", …) */
  final case class ECall(op: String, args: Seq[Expr]) extends Expr
  /** FILTER (NOT) EXISTS { pattern } */
  final case class EExists(op: Op, positive: Boolean) extends Expr
  /** aggregate reference inside SELECT/HAVING/ORDER (compiled by Group) */
  final case class EAgg(fn: String, arg: Option[Expr], distinct: Boolean,
      sep: Option[String]) extends Expr

  // ---- operators ------------------------------------------------------

  sealed trait Op
  final case class Bgp(pats: Seq[TriplePat], graph: Option[Node] = None) extends Op
  final case class Join(l: Op, r: Op) extends Op
  final case class LeftJoin(l: Op, r: Op, cond: Option[Expr]) extends Op
  final case class Union(l: Op, r: Op) extends Op
  final case class Minus(l: Op, r: Op) extends Op
  final case class Filter(cond: Expr, input: Op) extends Op
  final case class Extend(input: Op, v: String, e: Expr) extends Op
  final case class ValuesOp(vars: Seq[String], rows: Seq[Seq[Option[T]]]) extends Op
  /** keys may be plain vars or (expr AS ?v); aggs: output var → aggregate */
  final case class Group(input: Op, keys: Seq[(String, Option[Expr])],
      aggs: Seq[(String, EAgg)]) extends Op
  final case class Project(input: Op, vars: Seq[String]) extends Op
  final case class Distinct(input: Op) extends Op
  final case class OrderBy(input: Op, keys: Seq[(Expr, Boolean)]) extends Op
  final case class Slice(input: Op, offset: Long, limit: Long) extends Op
  /** empty group pattern `{}` — the unit solution */
  case object Unit0 extends Op
  /** `SERVICE [SILENT] <iri> { … }` — evaluated against an endpoint
    * from the in-process service registry ([[Sparql.registerService]]);
    * unregistered endpoints fail fast (no HTTP transport), or yield
    * the unit solution under SILENT per §18.8.
    */
  final case class Service(iri: String, inner: Op, silent: Boolean) extends Op
  /** COMPILER-INTERNAL leaf: an already-compiled solution frame
    * spliced back into the algebra — the key frame of nested-EXISTS
    * decorrelation ([[graft.sparql.Compiler]] compNestedExistsFilter).
    * Never produced by the parser; rewrites treat it as an opaque
    * leaf binding `vars`, of which `nullable` may be unbound.
    *
    * `idSafe`: every var's terms provably came out of the STORE (no
    * BIND/aggregate/VALUES/SERVICE provenance) — the compiler may then
    * hash the frame onto the 8-byte id plane (xxhash64 term identity)
    * and re-decode survivors through the dictionary without a
    * decode-drop risk. False = struct plane only.
    */
  final case class FrameOp(frame: org.apache.spark.sql.DataFrame,
      vars: Seq[String], nullable: Set[String],
      idSafe: Boolean = false) extends Op

  /** Variables that can be UNBOUND (NULL) in the operator's output.
    * BGP-bound variables are always bound; unboundness enters through
    * OPTIONAL right sides, UNION branches that lack a var, VALUES
    * UNDEF, computed/aggregate bindings (expressions can error), and
    * propagates through wrappers. Joins use this to apply SPARQL
    * compatible-mapping NULL semantics ONLY where a NULL can occur —
    * everywhere else the join stays a plain (hash-joinable) equality.
    */
  def maybeUnbound(op: Op): Set[String] = op match {
    case Bgp(_, _) => Set.empty
    case Join(l, r) => maybeUnbound(l) ++ maybeUnbound(r)
    case LeftJoin(l, r, _) =>
      // right-only vars are null on unmatched rows; shared vars take
      // the left value (see Compiler.solLeftJoin)
      maybeUnbound(l) ++ (inScope(r).toSet -- inScope(l).toSet)
    case Union(l, r) =>
      val (ls, rs) = (inScope(l).toSet, inScope(r).toSet)
      maybeUnbound(l) ++ maybeUnbound(r) ++ (ls diff rs) ++ (rs diff ls)
    case Minus(l, _) => maybeUnbound(l)
    case Filter(_, i) => maybeUnbound(i)
    case Extend(i, v, _) => maybeUnbound(i) + v // expressions can error
    case ValuesOp(vars, rows) =>
      vars.zipWithIndex.collect {
        case (v, i) if rows.exists(r => r(i).isEmpty) => v
      }.toSet
    case Group(i, keys, aggs) =>
      val in = maybeUnbound(i)
      keys.collect { case (v, None) if in(v) => v }.toSet ++
        keys.collect { case (v, Some(_)) => v }.toSet ++
        aggs.map(_._1).toSet
    case Project(i, vars) => maybeUnbound(i).intersect(vars.toSet)
    case Distinct(i) => maybeUnbound(i)
    case OrderBy(i, _) => maybeUnbound(i)
    case Slice(i, _, _) => maybeUnbound(i)
    case Unit0 => Set.empty
    // SILENT failure degrades to the unit solution → every inner var
    // may be unbound in the join above it
    case Service(_, i, silent) =>
      if (silent) inScope(i).toSet else maybeUnbound(i)
    case FrameOp(_, _, nullable, _) => nullable
  }

  /** Variables a CONSTRUCT template consumes (late-materialization
    * input: the compiler must decode these even though the op tree
    * never references them).
    */
  def templateVars(template: Seq[TriplePat]): Set[String] =
    template.flatMap { tp =>
      Seq(tp.s, tp.o).collect { case V(v) => v } ++
        (tp.p match { case PVar(v) => Seq(v); case _ => Nil })
    }.toSet

  /** Variables an expression reads (EXISTS sub-patterns excluded —
    * callers that must see them walk the op tree directly).
    */
  def exprVars(e: Expr): Set[String] = e match {
    case EVar(v) => Set(v)
    case ECall(_, as) => as.flatMap(exprVars).toSet
    case EAgg(_, arg, _, _) => arg.map(exprVars).getOrElse(Set.empty)
    case _ => Set.empty
  }

  def containsExists(e: Expr): Boolean = e match {
    case EExists(_, _) => true
    case ECall(_, as) => as.exists(containsExists)
    case _ => false
  }

  /** Hoist BIND (Extend) nodes above Joins where legal:
    * `{ ?s :p ?x . BIND(f(?x) AS ?v) . ?s :q ?y }` parses as
    * `Join(Extend(A, v, f), B)`; the equivalent
    * `Extend(Join(A, B), v, f)` computes f over the same bindings
    * (Extend only adds a column, so the bag is identical) and exposes
    * the pure BGP join tree underneath to the id plane — without the
    * rewrite one mid-group BIND drops the whole tree to struct joins.
    *
    * Legal iff the other join side neither binds the TARGET (the join
    * would otherwise be on ?v) nor binds a variable the expression
    * reads as unbound (BIND sees its lexical scope: a var bound only
    * LATER in the group is unbound at the BIND, and hoisting must not
    * change that). EXISTS-bearing expressions stay put — their
    * sub-pattern evaluation is positional.
    */
  def hoistExtends(op: Op): Op = op match {
    case Join(l0, r0) =>
      var l = hoistExtends(l0)
      var r = hoistExtends(r0)
      def hoistable(v: String, e: Expr, base: Op, other: Op): Boolean = {
        val otherScope = inScope(other).toSet
        !containsExists(e) && !otherScope.contains(v) &&
          exprVars(e).forall(x =>
            inScope(base).contains(x) || !otherScope.contains(x))
      }
      var lifted = Vector.empty[(String, Expr)] // outermost first
      var progress = true
      while (progress) {
        progress = false
        l match {
          case Extend(i, v, e) if hoistable(v, e, i, r) =>
            lifted :+= (v -> e); l = i; progress = true
          case _ => ()
        }
        r match {
          case Extend(i, v, e) if hoistable(v, e, i, l) =>
            lifted :+= (v -> e); r = i; progress = true
          case _ => ()
        }
      }
      // rebuild innermost-first so a stacked BIND reading an earlier
      // BIND's target keeps its producer below it
      lifted.foldRight(Join(l, r): Op)((ve, acc) => Extend(acc, ve._1, ve._2))
    case LeftJoin(l, r, c) => LeftJoin(hoistExtends(l), hoistExtends(r), c)
    case Union(l, r) => Union(hoistExtends(l), hoistExtends(r))
    case Minus(l, r) => Minus(hoistExtends(l), hoistExtends(r))
    // the dual rewrite: sink a FILTER below an Extend it does not
    // read — `{ pats . BIND . FILTER }` parses filter-outermost, and
    // Extend(Filter(Join…)) is the shape the id-plane pushdowns peel
    // (extendOverIds strips the filter stack with partial decode);
    // EXISTS-bearing conditions stay put (their sub-pattern could
    // share the bound var through the solution scope)
    case Filter(c, i) => hoistExtends(i) match {
      case Extend(i2, v, e) if !containsExists(c) && !exprVars(c).contains(v) =>
        hoistExtends(Extend(Filter(c, i2), v, e))
      case other => Filter(c, other)
    }
    case Extend(i, v, e) => Extend(hoistExtends(i), v, e)
    case Group(i, k, a) => Group(hoistExtends(i), k, a)
    case Project(i, vs) => Project(hoistExtends(i), vs)
    case Distinct(i) => Distinct(hoistExtends(i))
    case OrderBy(i, k) => OrderBy(hoistExtends(i), k)
    case Slice(i, o, n) => Slice(hoistExtends(i), o, n)
    case Service(u, i, s) => Service(u, hoistExtends(i), s)
    case leaf => leaf
  }

  /** All variables an operator can bind (used for projection & joins). */
  def inScope(op: Op): Seq[String] = {
    def nodeVars(n: Node): Seq[String] = n match {
      case V(x) => Seq(x); case _ => Nil
    }
    def pathVars(p: Path): Seq[String] = p match {
      case PVar(x) => Seq(x)
      case PInv(q) => pathVars(q)
      case PSeq(a, b) => pathVars(a) ++ pathVars(b)
      case PAlt(a, b) => pathVars(a) ++ pathVars(b)
      case PStar(q) => pathVars(q); case PPlus(q) => pathVars(q)
      case POpt(q) => pathVars(q)
      case _ => Nil
    }
    val vs = op match {
      case Bgp(ps, g) =>
        ps.flatMap(tp => nodeVars(tp.s) ++ pathVars(tp.p) ++ nodeVars(tp.o)) ++
          g.toSeq.flatMap(nodeVars)
      case Join(l, r) => inScope(l) ++ inScope(r)
      case LeftJoin(l, r, _) => inScope(l) ++ inScope(r)
      case Union(l, r) => inScope(l) ++ inScope(r)
      case Minus(l, _) => inScope(l)
      case Filter(_, i) => inScope(i)
      case Extend(i, v, _) => inScope(i) :+ v
      case ValuesOp(vars, _) => vars
      case Group(_, keys, aggs) => keys.map(_._1) ++ aggs.map(_._1)
      case Project(_, vars) => vars
      case Distinct(i) => inScope(i)
      case OrderBy(i, _) => inScope(i)
      case Slice(i, _, _) => inScope(i)
      case Unit0 => Nil
      case Service(_, i, _) => inScope(i)
      case FrameOp(_, vars, _, _) => vars
    }
    vs.distinct
  }
}
