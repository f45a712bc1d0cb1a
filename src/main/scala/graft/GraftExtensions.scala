package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomContains, DotProduct, HammingDistance, RepairMojibake, TokenCount, UnicodeNormalize}
import graft.plans.IntervalJoinStrategy

/** Session extensions registering the library's native expressions and
  * planner strategies — enable with
  * `spark.sql.extensions=graft.GraftExtensions` (the public Catalyst
  * extension point; no internal APIs involved).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(DotProduct.Name),
      new ExpressionInfo(classOf[DotProduct].getName, DotProduct.Name),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"${DotProduct.Name} takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(BloomContains.Name),
      new ExpressionInfo(classOf[BloomContains].getName, BloomContains.Name),
      (children: Seq[Expression]) => {
        require(children.length == 5,
          s"${BloomContains.Name} takes exactly 5 arguments")
        BloomContains(children(0), children(1), children(2),
          children(3), children(4))
      }))
    Seq(
      (UnicodeNormalize.NfcName, "NFC", false),
      (UnicodeNormalize.NfkcName, "NFKC", false),
      (UnicodeNormalize.StripAccentsName, "NFC", true)
    ).foreach { case (name, form, strip) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[UnicodeNormalize].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 1, s"$name takes exactly 1 argument")
          UnicodeNormalize(children.head, form, strip)
        }))
    }
    ext.injectFunction((
      FunctionIdentifier(RepairMojibake.Name),
      new ExpressionInfo(classOf[RepairMojibake].getName, RepairMojibake.Name),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"${RepairMojibake.Name} takes exactly 1 argument")
        RepairMojibake(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier(HammingDistance.Name),
      new ExpressionInfo(classOf[HammingDistance].getName,
        HammingDistance.Name),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"${HammingDistance.Name} takes exactly 2 arguments")
        HammingDistance(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(TokenCount.Name),
      new ExpressionInfo(classOf[TokenCount].getName, TokenCount.Name),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"${TokenCount.Name} takes exactly 1 argument")
        TokenCount(children.head)
      }))
    // thread the owning session through so plan-time width sampling runs
    // on the session that owns the plan, not whatever is `active`
    ext.injectPlannerStrategy(s => new IntervalJoinStrategy(Some(s)))
  }
}
