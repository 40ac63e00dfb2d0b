package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Repro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val keyCols = Seq("s","y")
    val kc = keyCols.map(col)
    val indexed = Seq((1,1,2.0,10L,5L),(1,1,3.0,10L,6L),(1,1,4.0,11L,7L)).toDF("s","y","f1","__bkt","__rn")
      .withColumn("__vec", array(col("f1")))
    val corpus = indexed.select(kc :+ col("__bkt") :+ col("__rn").as("__nrn") :+ col("__vec").as("__nv"): _*)
    val qSide = indexed.select(kc :+ col("__bkt") :+ col("__rn").as("__qrn") :+ col("__vec").as("__qv"): _*)
    val wgt = qSide.join(corpus, keyCols :+ "__bkt")
      .where(col("__nrn") =!= col("__qrn"))
      .withColumn("__d2", element_at(col("__qv"),1) - element_at(col("__nv"),1))
      .groupBy(kc :+ col("__qrn"): _*)
      .agg((avg(col("__d2"))+lit(1e-9)).as("__w0"))
      .withColumnRenamed("__qrn","__rn")
    val withW = indexed.join(wgt, keyCols :+ "__rn", "left")
      .withColumn("__w", coalesce(col("__w0"), lit(1.0)))
      .drop("__w0")
    println("withW cols: " + withW.columns.toSeq)
    val tot = withW.groupBy(kc: _*).agg(sum(col("__w")).as("__W"))
      .select(keyCols.zipWithIndex.map { case (c,i) => col(c).as(s"__tk$i") } :+ col("__W"): _*)
    val totCond = keyCols.zipWithIndex.map { case (c,i) => col(c) === col(s"__tk$i") }.reduce(_ && _)
    val j1 = withW.join(broadcast(tot), totCond)
    println("j1 cols: " + j1.columns.toSeq)
    val j2 = j1.drop(keyCols.indices.map(i => s"__tk$i"): _*)
    println("j2 cols: " + j2.columns.toSeq)
    val e = j2.withColumn("__exact", col("__w") / col("__W"))
    e.show()
    spark.stop()
  }
}
