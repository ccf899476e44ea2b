package graft.exec

import scala.sys.process.{Process, ProcessLogger}

import org.apache.spark.sql.{Dataset, SparkSession}

/** One executable unit: a single-task item (`taskKey = None`) or one nested
  * task of an item (`taskKey = Some("Task_i")`) — the exploded form of the
  * reference's runtime `TaskScript` polymorphism (`code/runner.py:168-194`).
  */
final case class TaskExec(itemID: String, taskKey: Option[String], script: String)

/** Result row; `status` mirrors the reference's Log.Status values plus the
  * partial-completion marker.
  */
final case class TaskOutcome(
    itemID: String,
    taskKey: Option[String],
    status: String, // Done | Failed | Wall_Time_Exceeded
    stdout: String,
    stderr: String,
    exitCode: Int,
    elapsedSeconds: Double,
    instanceID: String)

/** S12/X2/X3: distributed script execution (reference `code/executor.py:51-98`,
  * `code/runner.py:64-141`).
  *
  * The reference forks a Python `Popen` per task inside nested
  * multiprocessing pools (items × nests, `code/parallel_processes.py`). Here
  * the *scheduler* owns parallelism: tasks are Dataset rows, `repartition(n)`
  * is the two-level pool (X4/X5), and each partition runs its rows
  * sequentially through `scala.sys.process` — the Spark-idiomatic shape of
  * Hive TRANSFORM. Locking (`code/modifier.py:36-125`) is deliberately
  * absent: driver-assigned partitions give exactly-once claim, which is
  * strictly stronger than the reference's write-then-verify race (SURVEY.md
  * §2.9 concurrency note).
  */
object ScriptRunner {

  /** F3 env substitution (`code/executor.py:75`): `${VAR}` → value. */
  def substituteEnv(script: String, env: Map[String, String]): String =
    env.foldLeft(script) { case (s, (k, v)) => s.replace("${" + k + "}", v) }

  /** Execute tasks; budget (if any) is enforced per partition via
    * [[TimeKeeper]] — remaining rows in an exhausted partition are emitted
    * as `Wall_Time_Exceeded` without launching their process (T4).
    */
  def run(
      tasks: Dataset[TaskExec],
      env: Map[String, String] = Map.empty,
      budgetSeconds: Option[Double] = None,
      shell: Seq[String] = Seq("bash", "-c")): Dataset[TaskOutcome] = {
    val spark = tasks.sparkSession
    import spark.implicits._
    val envB = env
    val shellB = shell
    val budgetB = budgetSeconds
    tasks.mapPartitions { it =>
      val keeper = budgetB.map(new TimeKeeper(_))
      val instance = s"${java.net.InetAddress.getLocalHost.getHostName}-" +
        s"${org.apache.spark.TaskContext.getPartitionId()}"
      it.map { t =>
        if (keeper.exists(_.shouldStop)) {
          TaskOutcome(t.itemID, t.taskKey, "Wall_Time_Exceeded", "", "", -1, 0.0, instance)
        } else {
          val t0 = System.nanoTime()
          val out = new StringBuilder
          val err = new StringBuilder
          val logger = ProcessLogger(
            l => { out.append(l).append('\n'); () },
            l => { err.append(l).append('\n'); () })
          val code =
            try Process(shellB :+ substituteEnv(t.script, envB)).!(logger)
            catch { case e: Exception => err.append(e.getMessage).append('\n'); 127 }
          val elapsed = (System.nanoTime() - t0) / 1e9
          keeper.foreach(_.record(elapsed))
          TaskOutcome(t.itemID, t.taskKey,
            if (code == 0) "Done" else "Failed",
            out.result(), err.result(), code, elapsed, instance)
        }
      }
    }
  }
}
