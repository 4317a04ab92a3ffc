package graft.tools
object LexDbg {
  def main(args: Array[String]): Unit = {
    val q = """a + fill(0) b"""
    graft.lang.Lexer.tokenize(q).foreach(t => println(t))
    println(graft.lang.Parser.parse(q))
  }
}
