object IdemProbe {
  def main(args: Array[String]): Unit = {
    val s = "‘'/*\\G"
    val once = graft.chsql.ChLexer.cleanScript(s)
    val twice = graft.chsql.ChLexer.cleanScript(once)
    println(s"in   : ${s.map(c => f"$c%s(${c.toInt}%04x) ").mkString}")
    println(s"once : ${once.map(c => f"$c%s(${c.toInt}%04x) ").mkString}")
    println(s"twice: ${twice.map(c => f"$c%s(${c.toInt}%04x) ").mkString}")
  }
}
